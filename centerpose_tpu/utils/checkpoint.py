"""Checkpoint save/load (orbax) — the reference's save_model/load_model equivalent.

Parity target: src/lib/models/model.py:34-105 — checkpoints hold
{epoch, state_dict, optimizer}; `--resume` restores optimizer state and replays the
LR schedule (here the schedule is a pure function of `state.step`, so restoring the
step restores the LR); best/last/periodic naming follows main_CenterPose.py:90-110.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: Optional[int] = None) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(directory: str, state: Any, step: int, metadata: Optional[dict] = None):
    """Write a full TrainState at `step` under `directory`."""
    mgr = _manager(directory)
    mgr.save(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            **(
                {"metadata": ocp.args.JsonSave(metadata)} if metadata else {}
            ),
        ),
    )
    mgr.wait_until_finished()
    mgr.close()


def load_checkpoint(directory: str, state_template: Any, step: Optional[int] = None):
    """Restore a TrainState; step=None loads the latest (the reference's
    `--resume` → model_last behavior, opts.py:43-47)."""
    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {directory}")
    restored = mgr.restore(
        step, args=ocp.args.Composite(state=ocp.args.StandardRestore(state_template))
    )
    mgr.close()
    return restored["state"], step


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def load_partial(directory: str, params: Any, batch_stats: Any,
                 step: Optional[int] = None):
    """Reference `load_model` partial-init parity (model.py:34-87): copy every
    param/batch-stat leaf whose tree path exists in the checkpoint with a
    matching shape; skip the rest with a warning. This is how
    main_CenterPoseTrack initializes the Track model from CenterPose weights
    (shared DLA base + neck transfer; the twin stems / tracking heads stay at
    init). Returns (params, batch_stats, n_loaded, n_skipped)."""
    import jax.numpy as jnp
    import numpy as np

    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {directory}")
    restored = mgr.restore(step)
    mgr.close()
    src_state = restored["state"] if "state" in restored else restored
    srcs = {"params": src_state.get("params", {}),
            "batch_stats": src_state.get("batch_stats", {})}

    stats = {"loaded": 0, "skipped": 0}

    def merge(dst, src):
        if not isinstance(dst, dict):
            return dst
        out = {}
        for k, v in dst.items():
            sv = src.get(k) if isinstance(src, dict) else None
            if isinstance(v, dict):
                out[k] = merge(v, sv if isinstance(sv, dict) else {})
            elif sv is not None and np.shape(sv) == np.shape(v):
                out[k] = jnp.asarray(sv, jnp.asarray(v).dtype)
                stats["loaded"] += 1
            else:
                if sv is not None:
                    print(f"load_partial: shape mismatch at {k}: "
                          f"{np.shape(sv)} vs {np.shape(v)}, keeping init")
                stats["skipped"] += 1
                out[k] = v
        return out

    params = merge(params, srcs["params"])
    batch_stats = merge(batch_stats, srcs["batch_stats"])
    return params, batch_stats, stats["loaded"], stats["skipped"]
