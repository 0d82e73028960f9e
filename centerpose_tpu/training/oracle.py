"""Oracle / GT-substitution hooks for bug isolation.

Parity target: `gen_oracle_map` (src/lib/utils/oracle_utils.py:9-43, numba BFS fill)
and the `--eval_oracle_*` substitution points (trains/object_pose.py:67-83): replace
selected predictions with ground truth inside the loss/decode to isolate decode/PnP
bugs from network accuracy.

`gen_oracle_map` semantics: seed the output map with per-object vectors at their
`ind` pixels, then flood-fill every other pixel with the value of its nearest seed
(BFS ≈ nearest-seed in L2 for our purposes; implemented with a KD-tree instead of
numba).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def gen_oracle_map(values: np.ndarray, inds: np.ndarray, h: int, w: int) -> np.ndarray:
    """values [B, M, D], inds [B, M] flattened positions → dense [B, H, W, D] map
    where every pixel holds its nearest seeded object's vector."""
    from scipy.spatial import cKDTree

    b, m, d = values.shape
    out = np.zeros((b, h, w, d), np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    grid = np.stack([ys.ravel(), xs.ravel()], axis=1)
    for bi in range(b):
        valid = inds[bi] > 0
        if not valid.any():
            continue
        seeds = np.stack([inds[bi][valid] // w, inds[bi][valid] % w], axis=1)
        tree = cKDTree(seeds)
        _, nearest = tree.query(grid)
        out[bi] = values[bi][valid][nearest].reshape(h, w, d)
    return out


def apply_oracles(
    outputs: Dict, batch: Dict, oracles: Dict[str, bool], symmetry_id: int = 0
) -> Dict:
    """Substitute selected head outputs with GT (trains/object_pose.py:67-83).

    oracles keys: hm, hm_hp, kps, hp_offset — True replaces the prediction.
    GT heatmaps are logit-inverted so the loss/decode sigmoid recovers them.
    """
    import jax.numpy as jnp

    out = dict(outputs)

    def logit(p):
        p = jnp.clip(p, 1e-4, 1 - 1e-4)
        return jnp.log(p / (1 - p))

    if oracles.get("hm"):
        out["hm"] = logit(batch["hm"][:, symmetry_id])
    if oracles.get("hm_hp") and "hm_hp" in batch:
        out["hm_hp"] = logit(batch["hm_hp"][:, symmetry_id])
    if oracles.get("kps"):
        h, w = outputs["hps"].shape[1:3]
        dense = gen_oracle_map(
            np.asarray(batch["hps"][:, symmetry_id]),
            np.asarray(batch["ind"][:, symmetry_id]),
            h, w,
        )
        out["hps"] = jnp.asarray(dense)
    if oracles.get("hp_offset") and "hp_offset" in batch:
        h, w = outputs["hp_offset"].shape[1:3]
        dense = gen_oracle_map(
            np.asarray(batch["hp_offset"][:, symmetry_id]),
            np.asarray(batch["hp_ind"][:, symmetry_id]),
            h, w,
        )
        out["hp_offset"] = jnp.asarray(dense)
    return out
