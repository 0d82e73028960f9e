"""End-to-end .pth validation-harness test (VERDICT r2 #5).

Synthesizes a full reference-format torch checkpoint per architecture
({epoch, state_dict, optimizer} torch.save blobs, incl. the DataParallel
'module.' prefix), then runs scripts/validate_pth.py's actual code path —
torch.load → prefix strip → reference-model load → convert_state_dict →
forward compare — and asserts the deviation bound the README claims.

Load semantics under test: src/lib/models/model.py:34-87.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import torch_ref
from validate_pth import validate

RES = 128  # code-path test; full-res parity lives in test_torch_parity.py

ARCHS = [
    # (arch, offset_noise, atol)
    ("dlav0_34", 0.0, 1e-4),
    ("res_18", 0.0, 1e-4),
    ("resdcn_18", 0.01, 2e-4),
    ("dla_34", 0.01, 2e-4),
    ("dlav1_34", 0.01, 2e-4),
    ("hourglass", 0.0, 1e-4),
]


def _make_checkpoint(tmp_path, arch, offset_noise, wrap_module=False):
    """Build the reference model, randomize, and save a reference-format
    checkpoint (model.py:90-105 save_model layout)."""
    import torch

    from centerpose_tpu.config import preset

    head_conv = 64 if arch.startswith(("res", "hourglass")) else 256
    name = "centerpose" if arch.startswith("dlav1") else "centerpose_dla"
    cfg = preset(name, arch=arch, input_h=RES, input_w=RES, head_conv=head_conv)
    tmodel = torch_ref.build_ref_model(arch, dict(cfg.heads), cfg.head_conv)
    torch_ref.randomize_state(tmodel, seed=3, offset_noise=offset_noise)
    sd = tmodel.state_dict()
    if wrap_module:
        sd = {f"module.{k}": v for k, v in sd.items()}
    path = str(tmp_path / f"{arch}_test.pth")
    torch.save({"epoch": 140, "state_dict": sd}, path)
    return path


@pytest.mark.slow
@pytest.mark.parametrize("arch,offset_noise,atol", ARCHS)
def test_validate_pth_roundtrip(tmp_path, arch, offset_noise, atol):
    pth = _make_checkpoint(
        tmp_path, arch, offset_noise,
        wrap_module=(arch == "dlav1_34"),  # exercise the DataParallel strip
    )
    ok, devs = validate(pth, arch=arch, res=RES, atol=atol, verbose=False)
    assert ok, f"{arch} deviations: " + ", ".join(
        f"{h}={v:.2e}" for h, v in devs.items()
    )
    assert devs  # at least one head compared


def test_validate_pth_tracking(tmp_path):
    """CenterPoseTrack checkpoints: dla_34 + pre_img/pre_hm/pre_hm_hp stems +
    tracking heads (main_CenterPoseTrack.py:118-242), validated with the
    early-fusion inputs fed to both models."""
    import torch

    from centerpose_tpu.config import preset

    cfg = preset("centerpose_track", input_h=RES, input_w=RES)
    tmodel = torch_ref.build_ref_model(
        "dla_34", dict(cfg.heads), cfg.head_conv, tracking=True
    )
    torch_ref.randomize_state(tmodel, seed=7, offset_noise=0.01)
    path = str(tmp_path / "track.pth")
    torch.save({"epoch": 15, "state_dict": tmodel.state_dict()}, path)
    ok, devs = validate(
        path, arch="dla_34", tracking=True, res=RES, atol=2e-4, verbose=False
    )
    assert ok, "deviations: " + ", ".join(f"{h}={v:.2e}" for h, v in devs.items())
    assert "tracking" in devs and "tracking_hp" in devs


def test_validate_pth_bare_state_dict(tmp_path):
    """model.py:40 also accepts a bare state_dict (no {epoch, ...} wrapper)."""
    import torch

    from centerpose_tpu.config import preset

    cfg = preset("centerpose_dla", arch="dlav0_34", input_h=RES, input_w=RES)
    tmodel = torch_ref.build_ref_model("dlav0_34", dict(cfg.heads), cfg.head_conv)
    torch_ref.randomize_state(tmodel, seed=5)
    path = str(tmp_path / "bare.pth")
    torch.save(tmodel.state_dict(), path)
    ok, devs = validate(path, arch="dlav0_34", res=RES, atol=1e-4, verbose=False)
    assert ok and devs
