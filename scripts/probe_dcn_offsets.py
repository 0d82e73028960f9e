#!/usr/bin/env python
"""Probe whether the DCN offsets actually moved during training (VERDICT r4 #1).

Every DeformConvBlock computes its (offset, mask) from a ZERO-initialized
`conv_offset_mask` conv (DCNv2/dcn_v2.py:114-116 parity, models/layers.py:286),
so at init all offsets are exactly 0 and all gates sigmoid(0)=0.5 — the block
degenerates to a plain 3x3 conv. A trained checkpoint whose Pallas DCN
forward/backward (ops/dcn_onehot.py, ops/dcn_bwd.py) learned anything useful
must show nonzero offset fields. This script runs real frames through the
network with flax capture_intermediates and reports per-layer |offset| stats
(in feature-grid pixels) and mask-gate deviation from 0.5.
"""

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402


def _load_frames(data_dir, n, input_res):
    from PIL import Image

    from centerpose_tpu.config import DATA_MEAN, DATA_STD
    from centerpose_tpu.geometry.affine import get_affine_transform, warp_affine

    paths = []
    for root, _, files in os.walk(data_dir):
        paths.extend(
            os.path.join(root, f) for f in sorted(files) if f.endswith(".png")
        )
    paths = sorted(paths)[:n]
    if not paths:
        raise SystemExit(f"no .png frames under {data_dir}")
    batch = []
    for p in paths:
        img = np.asarray(Image.open(p).convert("RGB"), np.float32)
        h, w = img.shape[:2]
        c = np.array([w / 2.0, h / 2.0], np.float32)
        trans = get_affine_transform(
            c, max(h, w) * 1.0, 0, (input_res, input_res)
        )
        inp = warp_affine(img, trans, (input_res, input_res))
        batch.append((inp / 255.0 - DATA_MEAN) / DATA_STD)
    return np.stack(batch).astype(np.float32)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, help="checkpoint dir (e.g. .../best)")
    p.add_argument("--arch", default="dlav1_34")
    p.add_argument("--input_res", type=int, default=256)
    p.add_argument("--data_dir", required=True, help="frames to probe on")
    p.add_argument("--n_frames", type=int, default=8)
    p.add_argument("--out", default="", help="write the stats json here")
    p.add_argument("--init", action="store_true",
                   help="probe the RANDOM-INIT model instead of the checkpoint "
                        "(sanity: offsets must be exactly 0)")
    args = p.parse_args()

    import jax

    from centerpose_tpu.config import preset
    from centerpose_tpu.models import create_model

    cfg = preset(
        "centerpose" if args.arch.startswith("dlav1") else "centerpose_dla",
        category="shoe", arch=args.arch,
        input_h=args.input_res, input_w=args.input_res,
    )
    model = create_model(cfg)
    x = _load_frames(args.data_dir, args.n_frames, args.input_res)

    if args.init:
        variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
        variables = {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }
    else:
        from demo import _load_variables

        variables = _load_variables(args.ckpt, cfg)

    _, inter = model.apply(
        variables, x, train=False,
        capture_intermediates=lambda mdl, _m: mdl.name == "conv_offset_mask",
        mutable=["intermediates"],
    )

    def walk(tree, path=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                yield from walk(v, path + (k,))
        else:
            yield path, tree

    layers = {}
    for path, value in walk(inter["intermediates"]):
        if "conv_offset_mask" not in path:
            continue
        om = np.asarray(value[0] if isinstance(value, tuple) else value)
        off = om[..., :18]
        mask = 1.0 / (1.0 + np.exp(-om[..., 18:]))
        mag = np.abs(off)
        name = "/".join(p_ for p_ in path if p_ not in
                        ("intermediates", "conv_offset_mask", "__call__"))
        layers[name] = {
            "offset_abs_mean": float(mag.mean()),
            "offset_abs_p90": float(np.percentile(mag, 90)),
            "offset_abs_max": float(mag.max()),
            "mask_mean": float(mask.mean()),
            "mask_dev_from_half_mean": float(np.abs(mask - 0.5).mean()),
        }

    overall = {
        "n_dcn_layers": len(layers),
        "offset_abs_mean": float(
            np.mean([v["offset_abs_mean"] for v in layers.values()])
        ),
        "offset_abs_max": float(
            np.max([v["offset_abs_max"] for v in layers.values()])
        ),
        "mask_dev_from_half_mean": float(
            np.mean([v["mask_dev_from_half_mean"] for v in layers.values()])
        ),
        "weights": "random-init" if args.init else args.ckpt,
        "unit": "feature-grid pixels",
    }
    report = {"overall": overall, "layers": layers}
    print(json.dumps(overall, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
