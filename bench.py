"""Throughput benchmark: dlav1_34 forward+decode at 512x512 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is value / 500 — the BASELINE.json north-star of >=500 images/sec/chip
(the PyTorch reference runs 15 fps end-to-end on a GTX 1080Ti, README.md:9).

Protocol: batches are processed in CHAIN-long jit-internal sequences (lax.scan
with a scalar data dependence between iterations, so steps genuinely serialize
and each reads a distinct input tensor). This measures the steady-state serving
rate of a device-resident pipeline; without chaining, every dispatch over the
axon tunnel pays ~29-47 ms of fixed RTT/framework overhead that no production
deployment (host-local chip) would see. Each dispatch's result is fetched with
device_get — on this platform block_until_ready can return before execution
completes (CLAUDE.md).
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

TARGET = 500.0  # images/sec/chip north star (BASELINE.md)
# Experiment overrides (defaults are the recorded protocol). Batch sweep on
# v5e (NOTES_PERF round 2g): b32 397, b64 409, b128 472-476, b256 438 —
# per-step fixed costs (op launches, small ops) amortize with batch until
# ~b128, where HBM pressure turns the curve. b128/CHAIN=8 is the recorded
# serving point.
CHAIN = int(os.environ.get("BENCH_CHAIN", "8"))
# 4 timed dispatches (4096 images, ~35 s of chip time) — 2 was a small sample
# for the recorded artifact (VERDICT r2 weak #7).
DISPATCHES = int(os.environ.get("BENCH_DISPATCHES", "4"))
BATCH = int(os.environ.get("BENCH_BATCH", "128"))


def main():
    from centerpose_tpu.config import preset
    from centerpose_tpu.models import create_model
    from centerpose_tpu.ops.decode import object_pose_decode
    from centerpose_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    batch = BATCH
    # Production inference config: bf16 + the Pallas one-hot MXU DCN sampler
    # (ops/dcn_onehot.py; exact for |dy| <= 4 — at init offsets are exactly 0).
    cfg = preset("centerpose", compute_dtype="bfloat16", dcn_impl="onehot")
    model = create_model(cfg)

    rng = np.random.RandomState(0)
    x_init = jnp.zeros((1, cfg.input_h, cfg.input_w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x_init)

    @jax.jit
    def step_chain(variables, images):
        def body(carry, _):
            out = model.apply(variables, images + carry)
            outputs = {k: v.astype(jnp.float32) for k, v in out.items()}
            dets = object_pose_decode(
                outputs, k=cfg.K, rep_mode=cfg.rep_mode, inference=True,
                fit_gaussian=True,
            )
            # The carry serializes iterations and perturbs the next input.
            return dets["scores"].mean() * 1e-20, dets["scores"][0, 0, 0]
        _, scores = jax.lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
        return scores

    images = jnp.asarray(
        rng.randn(batch, cfg.input_h, cfg.input_w, 3).astype(np.float32)
    )

    # Warmup / compile; force a host transfer.
    out = step_chain(variables, images)
    float(jax.device_get(out).sum())

    t0 = time.perf_counter()
    outs = [step_chain(variables, images) for _ in range(DISPATCHES)]
    checksum = sum(float(jax.device_get(o)[0]) for o in outs)
    dt = time.perf_counter() - t0
    assert checksum == checksum  # NaN guard

    ips = batch * CHAIN * DISPATCHES / dt
    print(
        json.dumps(
            {
                "metric": "images_per_sec_per_chip_512x512_dlav1_34",
                "value": round(ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(ips / TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # pragma: no cover - depends on live TPU state
        # The axon tunnel occasionally surfaces a transient backend error
        # (observed: FAILED_PRECONDITION mid-dispatch). Retry ONCE in a fresh
        # process so a hiccup doesn't zero out the recorded benchmark; the
        # JSON line still goes to stdout from the retried run.
        import os
        import sys

        if os.environ.get("BENCH_RETRY"):
            raise
        import traceback

        traceback.print_exc()
        print(
            f"bench: transient failure ({type(e).__name__}: {e}); "
            "retrying once in a fresh process",
            file=sys.stderr,
        )
        time.sleep(30)
        os.environ["BENCH_RETRY"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)
