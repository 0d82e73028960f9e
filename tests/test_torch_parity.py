"""Random-weight forward parity vs the ACTUAL reference PyTorch code.

Builds the reference model from /root/reference/src/lib (torch-cpu), randomizes
its weights, converts the state_dict through models/convert.py, and asserts
forward-output agreement at 512x512 — the strongest available evidence that
the converter + architecture are exact, absent the released .pth blobs.

Reference constructors exercised:
  dlav0:    dlav0.py DLASeg (get_pose_net is broken upstream re: `opt`)
  res_18:   msra_resnet.py PoseResNet
  dla/dlav1: pose_dla_dcn.py DLASeg with the DCN stub bound to the repo's C++
             CPU oracle (tests/torch_ref.py)
  hourglass: large_hourglass.py get_large_hourglass_net
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centerpose_tpu.config import preset
from centerpose_tpu.models import create_model
from centerpose_tpu.models.convert import convert_state_dict

import torch_ref

RES = 512


def _build_and_compare(cfg, arch, tracking=False, offset_noise=0.0,
                       atol=1e-4, res=RES, extra_inputs=None):
    heads = dict(cfg.heads)
    tmodel = torch_ref.build_ref_model(
        arch, heads, cfg.head_conv, tracking=tracking
    )
    torch_ref.randomize_state(tmodel, seed=1, offset_noise=offset_noise)

    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (1, 3, res, res)).astype(np.float32)
    t_out = torch_ref.torch_forward(
        tmodel, x
    ) if extra_inputs is None else torch_ref.torch_forward_extra(tmodel, x, extra_inputs)

    model = create_model(cfg)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    jkw = {} if extra_inputs is None else {
        k: jnp.asarray(v.transpose(0, 2, 3, 1)) for k, v in extra_inputs.items()
    }
    variables = model.init(jax.random.PRNGKey(0), x_nhwc, **jkw)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    converted = convert_state_dict(
        sd, jax.tree.map(np.asarray, variables), use_gn=cfg.use_conv_gru
    )
    j_out = model.apply(converted, x_nhwc, train=False, **jkw)

    assert set(j_out) == set(t_out), (set(j_out), set(t_out))
    for head in t_out:
        ours = np.asarray(j_out[head]).transpose(0, 3, 1, 2)
        ref = t_out[head]
        assert ours.shape == ref.shape, (head, ours.shape, ref.shape)
        diff = np.max(np.abs(ours - ref))
        # Scale-aware 1e-4: heatmap logits reach |x|~100 with random BN stats,
        # where fp32 accumulation-order differences alone are ~1e-4 relative.
        bound = atol * max(1.0, float(np.max(np.abs(ref))))
        assert diff <= bound, (
            f"{head}: max|Δ| = {diff:.2e} > {bound:.2e} "
            f"(atol={atol}, max|ref|={np.max(np.abs(ref)):.1f})"
        )


@pytest.mark.slow
class TestForwardParity:
    def test_dlav0_34(self):
        cfg = preset("centerpose", arch="dlav0_34", input_h=RES, input_w=RES)
        _build_and_compare(cfg, "dlav0_34")

    def test_res_18(self):
        cfg = preset("centerpose", arch="res_18", input_h=RES, input_w=RES,
                     head_conv=64)
        _build_and_compare(cfg, "res_18")

    def test_resdcn_18(self):
        # resnet_dcn.py: DCN(3x3)+BN+ReLU then bilinear-init deconv per stage,
        # filters 256→128→64 (reference marks the arch untested; the structure
        # and converter mapping are verified here with the CPU-oracle DCN).
        cfg = preset("centerpose", arch="resdcn_18", input_h=RES, input_w=RES,
                     head_conv=64)
        _build_and_compare(cfg, "resdcn_18", offset_noise=0.01, atol=2e-4)

    def test_dla_34_oracle_dcn(self):
        # Plain dla_34 (no convGRU), DCN offsets perturbed away from zero so the
        # deformable sampling path is exercised for real.
        cfg = preset("centerpose_dla", input_h=RES, input_w=RES)
        _build_and_compare(cfg, "dla_34", offset_noise=0.01, atol=2e-4)

    def test_dla_34_tracking_stems(self):
        # CenterPoseTrack model: dla_34 + pre_img/pre_hm/pre_hm_hp early-fusion
        # stems (pose_dla_dcn.py:253-318) + tracking/tracking_hp heads
        # (main_CenterPoseTrack.py head wiring) — the one reference model
        # variant the per-arch tests above don't reach.
        cfg = preset("centerpose_track", input_h=RES, input_w=RES)
        rng = np.random.RandomState(3)
        extra = {
            "pre_img": rng.uniform(-1, 1, (1, 3, RES, RES)).astype(np.float32),
            "pre_hm": rng.uniform(0, 1, (1, 1, RES, RES)).astype(np.float32),
            "pre_hm_hp": rng.uniform(0, 1, (1, 8, RES, RES)).astype(np.float32),
        }
        _build_and_compare(cfg, "dla_34", tracking=True, offset_noise=0.01,
                           atol=2e-4, extra_inputs=extra)

    def test_dlav1_34_convgru(self):
        cfg = preset("centerpose", input_h=RES, input_w=RES)
        _build_and_compare(cfg, "dlav1_34", offset_noise=0.01, atol=2e-4)

    def test_hourglass(self):
        cfg = preset("centerpose", arch="hourglass", input_h=RES, input_w=RES,
                     head_conv=64)
        _build_and_compare(cfg, "hourglass")
