import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centerpose_tpu.config import preset
from centerpose_tpu.models import create_model


class TestPoseResNet:
    def test_res18_forward_shapes(self):
        cfg = preset("centerpose_dla", arch="res_18", input_h=64, input_w=64)
        model = create_model(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out["hm"].shape == (1, 16, 16, 1)
        assert out["hps"].shape == (1, 16, 16, 16)

    def test_res50_bottleneck(self):
        cfg = preset("centerpose_dla", arch="res_50", input_h=64, input_w=64)
        model = create_model(cfg)
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out["hm"].shape == (1, 16, 16, 1)


class TestOracle:
    def test_gen_oracle_map_nearest_fill(self):
        from centerpose_tpu.training.oracle import gen_oracle_map

        values = np.zeros((1, 2, 2), np.float32)
        values[0, 0] = [1.0, 2.0]
        values[0, 1] = [5.0, 6.0]
        inds = np.array([[1 * 8 + 1, 6 * 8 + 6]])  # seeds at (1,1) and (6,6)
        out = gen_oracle_map(values, inds, 8, 8)
        np.testing.assert_allclose(out[0, 1, 1], [1, 2])
        np.testing.assert_allclose(out[0, 6, 6], [5, 6])
        np.testing.assert_allclose(out[0, 0, 0], [1, 2])  # nearest = seed 0
        np.testing.assert_allclose(out[0, 7, 7], [5, 6])  # nearest = seed 1

    def test_apply_oracle_hm(self):
        from centerpose_tpu.training.oracle import apply_oracles

        hm_gt = np.zeros((1, 1, 8, 8, 1), np.float32)
        hm_gt[0, 0, 3, 3, 0] = 1.0
        outputs = {"hm": jnp.zeros((1, 8, 8, 1)), "hps": jnp.zeros((1, 8, 8, 16))}
        batch = {"hm": jnp.asarray(hm_gt)}
        out = apply_oracles(outputs, batch, {"hm": True})
        rec = np.asarray(jax.nn.sigmoid(out["hm"]))
        assert rec[0, 3, 3, 0] > 0.99
        assert rec[0, 0, 0, 0] < 0.01


class TestHourglass:
    def test_hourglass_forward(self):
        # 5 pooling levels require inputs >= 128 (the reference trains at 512).
        cfg = preset("centerpose_dla", arch="hourglass", input_h=128, input_w=128,
                     head_conv=64)
        model = create_model(cfg)
        x = jnp.zeros((1, 128, 128, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        # stride-4 heads from the last stack
        assert out["hm"].shape == (1, 32, 32, 1)
        assert out["hps"].shape == (1, 32, 32, 16)

    def test_hourglass_all_stacks(self):
        from centerpose_tpu.models.hourglass import HourglassNet

        cfg = preset("centerpose_dla", arch="hourglass", input_h=128, input_w=128,
                     head_conv=64)
        model = HourglassNet(cfg, return_all_stacks=True)
        x = jnp.zeros((1, 128, 128, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(variables, x)
        assert len(outs) == 2  # intermediate supervision (num_stacks)
        assert outs[0]["hm"].shape == outs[1]["hm"].shape
