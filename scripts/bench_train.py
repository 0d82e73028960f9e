"""Training-throughput benchmark: dlav1_34 full train step at 512x512, one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} like bench.py
(`vs_baseline` is value / 5.52 — the round-2f remat+chunked-autodiff baseline
of 5.52 img/s, NOTES_PERF). The recorded protocol is the fast TPU training
config: onehot DCN forward + Pallas fused kernel backward (ops/dcn_bwd.py) +
bf16 compute with f32 params/optimizer/loss, batch 16 per chip (the largest
batch that fits one v5e at 512², NOTES_PERF round 2j).

Per-dispatch timing (no chaining): a train step is ~320 ms, so the ~30-45 ms
tunnel RTT is amortized enough for a stable figure; each step's loss is
device_get-fetched (block_until_ready can return early on this platform).

Env overrides: BENCH_TRAIN_BATCH, BENCH_TRAIN_DTYPE (float32|bfloat16),
BENCH_TRAIN_DCN (gather|onehot), BENCH_TRAIN_BWD (auto|autodiff),
BENCH_TRAIN_ARCH (decomposition probes: dlav0_34 = no-DCN concat neck,
dla_34 = DCN neck + plain heads — deltas vs dlav1_34 isolate the DCN and
convGRU shares of the step), BENCH_TRAIN_RES (CPU smoke runs; the recorded
protocol is 512), BENCH_TRAIN_TRACK=1 (CenterPoseTrack: the track preset —
dla_34 + pre_img/pre_hm/pre_hm_hp early-fusion stems + tracking heads,
main_CenterPoseTrack.py:118-242 — with synthetic prev-frame inputs).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_IMG_S = 5.52   # round-2f autodiff train step (2898 ms / 16 img)
BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", "16"))
DTYPE = os.environ.get("BENCH_TRAIN_DTYPE", "bfloat16")
DCN = os.environ.get("BENCH_TRAIN_DCN", "onehot")
BWD = os.environ.get("BENCH_TRAIN_BWD", "auto")
ARCH = os.environ.get("BENCH_TRAIN_ARCH", "dlav1_34")
RES = int(os.environ.get("BENCH_TRAIN_RES", "512"))
TRACK = os.environ.get("BENCH_TRAIN_TRACK", "") == "1"


def main():
    from centerpose_tpu.config import preset
    from centerpose_tpu.data.targets import (
        ObjectAnnotation,
        render_targets,
        stack_batch,
    )
    from centerpose_tpu.models import create_model
    from centerpose_tpu.training.trainer import (
        create_train_state,
        make_train_step,
    )

    kw = dict(
        input_h=RES, input_w=RES, dcn_impl=DCN, dcn_bwd=BWD,
        compute_dtype=DTYPE, remat_dcn=False, remat_stem=False,
    )
    if not TRACK or "BENCH_TRAIN_ARCH" in os.environ:
        kw["arch"] = ARCH
    cfg = preset("centerpose_track" if TRACK else "centerpose", **kw)
    rng = np.random.RandomState(0)
    samples = []
    for _ in range(BATCH):
        obj = ObjectAnnotation(
            center=np.array([64.0, 64.0]),
            size=np.array([30.0, 30.0]),
            keypoints=rng.uniform(
                10, 100, size=(cfg.num_symmetry, 8, 2)
            ).astype(np.float32),
            keypoints_visible=np.ones((cfg.num_symmetry, 8), bool),
            scale_3d=np.array([1.0, 1.0, 1.0], np.float32),
            tracking=np.array([1.5, -1.0], np.float32) if TRACK else None,
            tracking_hp=rng.uniform(-2, 2, (8, 2)).astype(np.float32)
            if TRACK else None,
        )
        samples.append(render_targets([obj], cfg))
    batch = stack_batch(samples)
    batch["input"] = rng.randn(BATCH, RES, RES, 3).astype(np.float32)
    if TRACK:
        # Synthetic prev-frame inputs (the dataset renders these from the
        # previous frame's GT/detections; the step cost is shape-driven).
        batch["pre_img"] = rng.randn(BATCH, RES, RES, 3).astype(np.float32)
        batch["pre_hm"] = rng.rand(BATCH, RES, RES, 1).astype(np.float32)
        batch["pre_hm_hp"] = rng.rand(BATCH, RES, RES, 8).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    model = create_model(cfg)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, tx)

    state, stats = step(state, batch)       # compile + warm
    float(jax.device_get(stats["loss"]))

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, stats = step(state, batch)
        float(jax.device_get(stats["loss"]))
        times.append(time.perf_counter() - t0)
    img_s = BATCH / min(times)
    print(json.dumps({
        "metric": (
            f"train_images_per_sec_per_chip_{RES}x{RES}_"
            f"{'track_' if TRACK else ''}{cfg.arch}_b{BATCH}"
        ),
        "value": round(img_s, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 4),
    }))


if __name__ == "__main__":
    main()
