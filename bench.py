"""Throughput benchmark: dlav1_34 forward+decode at 512x512 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is value / 500 — the BASELINE.json north-star of >=500 images/sec/chip
(the PyTorch reference runs 15 fps end-to-end on a GTX 1080Ti, README.md:9).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

TARGET = 500.0  # images/sec/chip north star (BASELINE.md)


def main():
    from centerpose_tpu.config import preset
    from centerpose_tpu.models import create_model
    from centerpose_tpu.ops.decode import object_pose_decode

    batch = 32
    # Production inference config: bf16 + the Pallas one-hot MXU DCN sampler
    # (ops/dcn_onehot.py; exact for |dy| <= 4 — at init offsets are exactly 0).
    cfg = preset("centerpose", compute_dtype="bfloat16", dcn_impl="onehot")
    model = create_model(cfg)

    rng = np.random.RandomState(0)
    x_init = jnp.zeros((1, cfg.input_h, cfg.input_w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x_init)

    @jax.jit
    def step(variables, images):
        outputs = model.apply(variables, images)
        outputs = {k: v.astype(jnp.float32) for k, v in outputs.items()}
        return object_pose_decode(
            outputs, k=cfg.K, rep_mode=cfg.rep_mode, inference=True,
            fit_gaussian=False,
        )

    images = jnp.asarray(
        rng.randn(batch, cfg.input_h, cfg.input_w, 3).astype(np.float32)
    )

    # Warmup / compile. Force a host transfer — on the experimental axon platform
    # block_until_ready may return before execution completes.
    out = step(variables, images)
    float(jax.device_get(out["scores"]).sum())

    # Sustained-throughput protocol: enqueue all iterations (dispatch is
    # async), then force-fetch every output. Each device_get completes its
    # iteration, so total wall covers all device work while the tunnel RTT is
    # paid once instead of per iteration — the steady-state serving rate.
    iters = 20
    t0 = time.perf_counter()
    outs = [step(variables, images) for _ in range(iters)]
    checksum = sum(float(jax.device_get(o["scores"])[0, 0, 0]) for o in outs)
    dt = time.perf_counter() - t0
    assert checksum == checksum  # NaN guard

    ips = batch * iters / dt
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
    main()
