#!/usr/bin/env python
"""Numeric-parity validation against a RELEASED reference checkpoint (.pth).

The test suite proves converter+architecture exactness with random weights
(tests/test_torch_parity.py) and exercises THIS script's code path end-to-end
with synthesized checkpoints (tests/test_validate_pth.py); the CLI is the
ready-to-run harness for the real released blobs (absent in this image): it
loads the .pth into BOTH the reference PyTorch model (/root/reference/src/lib,
torch-cpu) and this framework (via models/convert.py), runs the same random
input through both, and reports the per-head max deviation.

Checkpoint format + load semantics mirror the reference loader
(src/lib/models/model.py:34-87): {epoch, state_dict, optimizer} dicts or bare
state_dicts, with DataParallel 'module.' prefixes stripped.

Usage:
  python scripts/validate_pth.py --pth shoe_v1_140.pth --arch dlav1_34 \
      [--tracking] [--res 512] [--atol 1e-3]

Exit code 0 iff every head agrees within --atol (scale-aware, see below).
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for _p in (REPO, os.path.join(REPO, "tests")):
    if _p not in sys.path:
        sys.path.insert(0, _p)


def validate(pth, arch="dlav1_34", tracking=False, res=512, atol=1e-3,
             verbose=True):
    """Load `pth` into both models and compare forwards.

    Returns (ok, {head: max_rel_deviation}). The deviation is |ours - ref|
    max, relative to max(|ref|max, 1) per head.
    """
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    import torch_ref  # tests/torch_ref.py — reference constructors + DCN stub

    from centerpose_tpu.config import preset
    from centerpose_tpu.models import create_model
    from centerpose_tpu.models.convert import convert_state_dict

    name = "centerpose_track" if tracking else (
        "centerpose" if arch.startswith("dlav1") else "centerpose_dla"
    )
    head_conv = 64 if (arch.startswith(("res", "hourglass"))) else 256
    cfg = preset(name, arch=arch, input_h=res, input_w=res, head_conv=head_conv)

    # Reference model with the released weights (model.py:34-51 semantics:
    # optional 'state_dict' wrapper, 'module.' DataParallel prefix strip).
    tmodel = torch_ref.build_ref_model(
        arch, dict(cfg.heads), cfg.head_conv, tracking=tracking
    )
    ckpt = torch.load(pth, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    if verbose and (missing or unexpected):
        print(f"WARNING: missing={list(missing)[:5]} unexpected={list(unexpected)[:5]}")
    tmodel.eval()

    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (1, 3, res, res)).astype(np.float32)
    extra = {}
    if tracking:
        # Exercise the pre_img/pre_hm/pre_hm_hp early-fusion stems too
        # (pose_dla_dcn.py:523-526 skips them when the inputs are None).
        extra = {
            "pre_img": rng.uniform(-1, 1, (1, 3, res, res)).astype(np.float32),
            "pre_hm": rng.uniform(0, 1, (1, 1, res, res)).astype(np.float32),
            "pre_hm_hp": rng.uniform(0, 1, (1, 8, res, res)).astype(np.float32),
        }
        t_out = torch_ref.torch_forward_extra(tmodel, x, extra)
    else:
        t_out = torch_ref.torch_forward(tmodel, x)

    # Our model with the converted weights.
    model = create_model(cfg)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    jkw = {
        k: jnp.asarray(v.transpose(0, 2, 3, 1)) for k, v in extra.items()
    }
    variables = model.init(jax.random.PRNGKey(0), x_nhwc, **jkw)
    np_sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    converted = convert_state_dict(
        np_sd, jax.tree.map(np.asarray, variables), use_gn=cfg.use_conv_gru
    )
    j_out = model.apply(converted, x_nhwc, train=False, **jkw)

    ok = True
    devs = {}
    for head in sorted(t_out):
        ours = np.asarray(j_out[head]).transpose(0, 3, 1, 2)
        ref = t_out[head]
        scale = max(np.abs(ref).max(), 1.0)
        rel = float(np.abs(ours - ref).max() / scale)
        devs[head] = rel
        status = "OK  " if rel <= atol else "FAIL"
        ok &= rel <= atol
        if verbose:
            print(f"{status} {head:16s} max_rel={rel:.3e} (|ref|max={scale:.3g})")
    if verbose:
        print("PARITY OK" if ok else "PARITY FAILED")
    return ok, devs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True)
    p.add_argument("--arch", default="dlav1_34")
    p.add_argument("--tracking", action="store_true")
    p.add_argument("--res", type=int, default=512)
    p.add_argument(
        "--atol", type=float, default=1e-3,
        help="max |ours - ref| per head, relative to the head's max |ref|",
    )
    args = p.parse_args()
    ok, _ = validate(
        args.pth, arch=args.arch, tracking=args.tracking, res=args.res,
        atol=args.atol,
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
