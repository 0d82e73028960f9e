"""Space-to-depth stem chain: exactness vs the plain layout.

ops/s2d.py rewrites the DLA stem convs in S2D f=2 layout for TPU efficiency;
these tests pin that the transform is numerically exact (same params, same
outputs mod fp reassociation) at the op level and through the full model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from centerpose_tpu.config import preset
from centerpose_tpu.models import create_model
from centerpose_tpu.ops.s2d import (
    depth_to_space,
    s2d_conv_kernel,
    s2d_exit_kernel,
    s2d_padding,
    space_to_depth,
)


def _conv(x, w, stride, pad):
    return lax.conv_general_dilated(
        x, w, (stride, stride), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


class TestS2DOps:
    def test_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 6, 5))
        np.testing.assert_array_equal(
            np.asarray(depth_to_space(space_to_depth(x, 2), 2)), np.asarray(x)
        )

    @pytest.mark.parametrize("k,ci,co", [(7, 3, 16), (3, 16, 16), (5, 4, 8)])
    def test_s1_conv_exact(self, k, ci, co):
        rng = np.random.RandomState(k)
        x = jnp.asarray(rng.randn(2, 32, 24, ci).astype(np.float32))
        w = jnp.asarray(rng.randn(k, k, ci, co).astype(np.float32) * 0.1)
        r = (k - 1) // 2
        ref = _conv(x, w, 1, [(r, r), (r, r)])
        got = depth_to_space(
            _conv(space_to_depth(x, 2), s2d_conv_kernel(w), 1, s2d_padding(k)),
            2,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_exit_conv_exact(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 32, 24, 16).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 16, 32).astype(np.float32) * 0.1)
        ref = _conv(x, w, 2, [(1, 1), (1, 1)])
        got = _conv(
            space_to_depth(x, 2), s2d_exit_kernel(w), 1, [(1, 0), (1, 0)]
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


class TestS2DModel:
    @pytest.mark.parametrize("tracking", [False, True])
    def test_full_model_matches_plain(self, tracking):
        """dlav1 forward with s2d_stem on vs off — same params, same output."""
        cfg_off = preset(
            "centerpose_track" if tracking else "centerpose",
            input_h=64, input_w=64, s2d_stem=False,
        )
        cfg_on = preset(
            "centerpose_track" if tracking else "centerpose",
            input_h=64, input_w=64, s2d_stem=True,
        )
        model_off = create_model(cfg_off)
        model_on = create_model(cfg_on)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        extra = {}
        if tracking:
            extra = dict(
                pre_img=jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32)),
                pre_hm=jnp.asarray(rng.randn(1, 64, 64, 1).astype(np.float32)),
                pre_hm_hp=jnp.asarray(
                    rng.randn(1, 64, 64, 8).astype(np.float32)
                ),
            )
        variables = model_off.init(jax.random.PRNGKey(0), x, **extra)
        out_off = model_off.apply(variables, x, **extra, train=False)
        out_on = model_on.apply(variables, x, **extra, train=False)
        assert set(out_off) == set(out_on)
        for head in out_off:
            a, b = np.asarray(out_off[head]), np.asarray(out_on[head])
            bound = 1e-4 * max(1.0, float(np.max(np.abs(a))))
            assert np.max(np.abs(a - b)) <= bound, (
                head, float(np.max(np.abs(a - b))), bound
            )

    def test_multi_conv_level_falls_back(self):
        """levels[0] != 1 (not DLA-34): the S2D gate takes the plain path."""
        from centerpose_tpu.models.dla import DLA

        rng = np.random.RandomState(0)
        dla = DLA(levels=(2, 2, 1, 2, 2, 1), s2d_stem=True, dtype=jnp.float32)
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        v = dla.init(jax.random.PRNGKey(0), x)
        outs = dla.apply(v, x, train=False)
        assert outs[0].shape == (1, 64, 64, 16)

    def test_train_path_unaffected(self):
        """train=True ignores s2d (BN stat updates need the plain path)."""
        cfg = preset("centerpose", input_h=64, input_w=64, s2d_stem=True)
        model = create_model(cfg)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        out, mut = model.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        assert "hm" in out and "batch_stats" in mut
