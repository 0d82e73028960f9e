import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centerpose_tpu.config import preset
from centerpose_tpu.models import create_model


def _init_and_run(cfg, shape=(1, 64, 64, 3), **extra):
    model = create_model(cfg)
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, **extra)
    out = model.apply(variables, x, **extra)
    return variables, out


class TestCenterPoseNet:
    def test_dlav1_heads_and_shapes(self):
        cfg = preset("centerpose")
        _, out = _init_and_run(cfg)
        assert set(out) == {"hm", "wh", "hps", "reg", "hm_hp", "hp_offset", "scale"}
        assert out["hm"].shape == (1, 16, 16, 1)
        assert out["wh"].shape == (1, 16, 16, 2)
        assert out["hps"].shape == (1, 16, 16, 16)
        assert out["hm_hp"].shape == (1, 16, 16, 8)
        assert out["scale"].shape == (1, 16, 16, 3)

    def test_hm_bias_init_focal_prior(self):
        cfg = preset("centerpose")
        variables, out = _init_and_run(cfg)
        bias = variables["params"]["hm"]["out"]["bias"]
        np.testing.assert_allclose(np.asarray(bias), -2.19, atol=1e-6)
        # With zero input, hm logits should sit near the prior.
        assert float(jnp.abs(out["hm"].mean() + 2.19)) < 1.5

    def test_dla34_plain_heads(self):
        cfg = preset("centerpose_dla")
        _, out = _init_and_run(cfg)
        assert "hm" in out and out["hm"].shape == (1, 16, 16, 1)

    def test_tracking_model_extra_inputs_and_heads(self):
        cfg = preset("centerpose_track")
        model = create_model(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        pre_img = jnp.zeros((1, 64, 64, 3), jnp.float32)
        pre_hm = jnp.zeros((1, 64, 64, 1), jnp.float32)
        pre_hm_hp = jnp.zeros((1, 64, 64, 8), jnp.float32)
        variables = model.init(
            jax.random.PRNGKey(0), x, pre_img=pre_img, pre_hm=pre_hm,
            pre_hm_hp=pre_hm_hp,
        )
        out = model.apply(
            variables, x, pre_img=pre_img, pre_hm=pre_hm, pre_hm_hp=pre_hm_hp
        )
        for head in ("tracking", "tracking_hp", "hps_uncertainty", "scale_uncertainty"):
            assert head in out
        assert out["tracking"].shape == (1, 16, 16, 2)
        assert out["tracking_hp"].shape == (1, 16, 16, 16)

    def test_dlav0_no_dcn(self):
        cfg = preset("centerpose").replace(arch="dlav0_34")
        variables, out = _init_and_run(cfg)
        flat = jax.tree_util.tree_leaves_with_path(variables["params"])
        names = "/".join(jax.tree_util.keystr(p) for p, _ in flat)
        assert "conv_offset_mask" not in names
        assert out["hm"].shape == (1, 16, 16, 1)

    def test_upsample_conv_bilinear_init(self):
        # Depthwise transposed conv at init == bilinear x2 upsampling of impulses.
        from centerpose_tpu.models.layers import UpsampleConv

        m = UpsampleConv(2)
        x = np.zeros((1, 4, 4, 1), np.float32)
        x[0, 1, 1, 0] = 1.0
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = m.apply(v, jnp.asarray(x))
        assert y.shape == (1, 8, 8, 1)
        out = np.asarray(y)[0, :, :, 0]
        # f=2 bilinear kernel is outer([.25,.75,.75,.25]): impulse spreads to a
        # symmetric 4x4 patch with max .5625 centered between (2,2)-(3,3).
        assert out.max() == pytest.approx(0.5625, abs=1e-5)
        np.testing.assert_allclose(out[2:4, 2:4], 0.5625, atol=1e-5)
        # Mass is conserved for x2 bilinear (sums to f^2 = 4).
        assert out.sum() == pytest.approx(4.0, abs=1e-4)
        # 4x4 support around the source pixel, zero elsewhere.
        assert out[6:, :].max() == 0.0 and out[:, 6:].max() == 0.0

    def test_train_mode_updates_batch_stats(self):
        cfg = preset("centerpose_dla")
        model = create_model(cfg)
        x = jnp.ones((2, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out, mutated = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        assert "batch_stats" in mutated
        assert "hm" in out
