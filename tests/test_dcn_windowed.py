"""Windowed (shifted-FMA) DCN sampling vs the exact gather implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from centerpose_tpu.ops.dcn import dcn_v2
from centerpose_tpu.ops.dcn_pallas import dcn_v2_windowed


def _inputs(offset_scale=1.5, seed=0, h=12, w=12, c=4, co=6, b=2):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)),
        jnp.asarray((rng.randn(b, h, w, 18) * offset_scale).astype(np.float32)),
        jnp.asarray(rng.rand(b, h, w, 9).astype(np.float32)),
        jnp.asarray(rng.randn(3, 3, c, co).astype(np.float32) * 0.2),
        jnp.asarray(rng.randn(co).astype(np.float32)),
    )


class TestWindowedDCN:
    def test_matches_exact_within_window(self):
        x, off, mask, w, b = _inputs(offset_scale=1.2)
        exact = dcn_v2(x, off, mask, w, b)
        win = dcn_v2_windowed(x, off, mask, w, b, radius=6)
        np.testing.assert_allclose(
            np.asarray(win), np.asarray(exact), atol=2e-5
        )

    def test_pallas_matches_exact(self):
        x, off, mask, w, b = _inputs(offset_scale=1.2, seed=1)
        exact = dcn_v2(x, off, mask, w, b)
        win = dcn_v2_windowed(x, off, mask, w, b, radius=6, use_pallas=True)
        np.testing.assert_allclose(
            np.asarray(win), np.asarray(exact), atol=2e-5
        )

    def test_out_of_window_clamps_to_zero_contribution(self):
        # One out-of-window (but in-image) offset: windowed drops that tap;
        # exact keeps it.
        x, off, mask, w, b = _inputs(offset_scale=0.0, seed=2)
        off = np.asarray(off).copy()
        off[0, 1, 6, 0] = 8.0  # tap-0 dy: sample row 8 (in image), shift 7 > R+2
        off = jnp.asarray(off)
        exact = dcn_v2(x, off, mask, w, b)
        win = dcn_v2_windowed(x, off, mask, w, b, radius=2)
        d = np.abs(np.asarray(exact) - np.asarray(win))
        # Only the affected pixel differs.
        assert d[0, 1, 6].max() > 0
        d[0, 1, 6] = 0
        assert d.max() < 2e-5

    def test_zero_offsets_equal_conv_path(self):
        x, _, _, w, b = _inputs(seed=3)
        off = jnp.zeros((2, 12, 12, 18), jnp.float32)
        mask = jnp.ones((2, 12, 12, 9), jnp.float32)
        exact = dcn_v2(x, off, mask, w, b)
        win = dcn_v2_windowed(x, off, mask, w, b, radius=2)
        np.testing.assert_allclose(np.asarray(win), np.asarray(exact), atol=2e-5)

    def test_model_with_windowed_impl(self):
        import jax

        from centerpose_tpu.config import preset
        from centerpose_tpu.models import create_model

        cfg = preset("centerpose_dla", input_h=64, input_w=64).replace(
            dcn_impl="windowed", dcn_window_radius=2
        )
        model = create_model(cfg)
        xin = jnp.zeros((1, 64, 64, 3), jnp.float32)
        v = model.init(jax.random.PRNGKey(0), xin)
        out = model.apply(v, xin)
        assert out["hm"].shape == (1, 16, 16, 1)

    def test_windowed_matches_gather_model_at_init(self):
        # At zero-init offsets the two impls must agree through the whole net.
        import jax

        from centerpose_tpu.config import preset
        from centerpose_tpu.models import create_model

        rng = np.random.RandomState(4)
        xin = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
        cfg_g = preset("centerpose_dla", input_h=64, input_w=64)
        cfg_w = cfg_g.replace(dcn_impl="windowed", dcn_window_radius=2)
        m_g = create_model(cfg_g)
        m_w = create_model(cfg_w)
        v = m_g.init(jax.random.PRNGKey(0), xin)
        out_g = m_g.apply(v, xin)
        out_w = m_w.apply(v, xin)
        for k in out_g:
            np.testing.assert_allclose(
                np.asarray(out_w[k]), np.asarray(out_g[k]), atol=5e-4,
                err_msg=k,
            )
