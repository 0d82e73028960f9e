import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centerpose_tpu.ops.dcn import dcn_v2


def _plain_conv(x, weight, bias, stride=1, padding=1):
    out = jax.lax.conv_general_dilated(
        x,
        weight,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias


class TestDCNv2:
    def test_zero_offset_unit_mask_equals_conv(self):
        # DCN with zero offsets and mask=1 must reduce to a plain 3x3 conv
        # (the reference's check_zero_offset test, DCNv2/testcpu.py:32-60).
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(6).astype(np.float32))
        offset = jnp.zeros((2, 8, 8, 18), jnp.float32)
        mask = jnp.ones((2, 8, 8, 9), jnp.float32)

        got = dcn_v2(x, offset, mask, w, b)
        want = _plain_conv(x, w, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def test_integer_offset_shifts_sampling(self):
        # A +1 x-offset on every tap samples one pixel to the right: equivalent to
        # convolving an x-shifted image (away from borders).
        rng = np.random.RandomState(1)
        x = np.zeros((1, 9, 9, 1), np.float32)
        x[0, :, :, 0] = rng.randn(9, 9)
        w = jnp.asarray(rng.randn(3, 3, 1, 2).astype(np.float32))
        b = jnp.zeros((2,), jnp.float32)

        offset = np.zeros((1, 9, 9, 18), np.float32)
        offset[..., 1::2] = 1.0  # dx = +1 on all taps
        mask = jnp.ones((1, 9, 9, 9), jnp.float32)

        got = dcn_v2(jnp.asarray(x), jnp.asarray(offset), mask, w, b)

        x_shift = np.zeros_like(x)
        x_shift[:, :, :-1] = x[:, :, 1:]
        want = _plain_conv(jnp.asarray(x_shift), w, b)
        # Interior only (border columns see different zero-padding).
        np.testing.assert_allclose(
            np.asarray(got)[0, 2:-2, 2:-2], np.asarray(want)[0, 2:-2, 2:-2], atol=1e-4
        )

    def test_fractional_offset_bilinear(self):
        # Single tap active via mask; 0.5 offset averages two pixels.
        x = np.zeros((1, 5, 5, 1), np.float32)
        x[0, 2, 2, 0] = 2.0
        x[0, 2, 3, 0] = 4.0
        w = np.zeros((3, 3, 1, 1), np.float32)
        w[1, 1, 0, 0] = 1.0  # center tap only
        offset = np.zeros((1, 5, 5, 18), np.float32)
        offset[0, 2, 2, 2 * 4 + 1] = 0.5  # center tap (t=4) dx = 0.5
        mask = np.zeros((1, 5, 5, 9), np.float32)
        mask[..., 4] = 1.0

        got = dcn_v2(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(w), jnp.zeros((1,), jnp.float32),
        )
        assert float(got[0, 2, 2, 0]) == pytest.approx(3.0, abs=1e-5)

    def test_mask_scales_output(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 6, 6, 3).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 3, 2).astype(np.float32))
        b = jnp.zeros((2,), jnp.float32)
        offset = jnp.zeros((1, 6, 6, 18), jnp.float32)
        half = jnp.full((1, 6, 6, 9), 0.5, jnp.float32)
        ones = jnp.ones((1, 6, 6, 9), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(dcn_v2(x, offset, half, w, b)),
            0.5 * np.asarray(dcn_v2(x, offset, ones, w, b)),
            atol=1e-5,
        )

    def test_out_of_bounds_sampling_is_zero(self):
        x = jnp.ones((1, 4, 4, 1), jnp.float32)
        w = np.zeros((3, 3, 1, 1), np.float32)
        w[1, 1, 0, 0] = 1.0
        offset = np.zeros((1, 4, 4, 18), np.float32)
        offset[0, 0, 0, 2 * 4 + 0] = -100.0  # push center tap far out of bounds
        mask = np.zeros((1, 4, 4, 9), np.float32)
        mask[..., 4] = 1.0
        got = dcn_v2(
            x, jnp.asarray(offset), jnp.asarray(mask), jnp.asarray(w),
            jnp.zeros((1,), jnp.float32),
        )
        assert float(got[0, 0, 0, 0]) == 0.0
        assert float(got[0, 1, 1, 0]) == pytest.approx(1.0)

    def test_grad_flows(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(1, 5, 5, 2).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32) * 0.1)
        b = jnp.zeros((2,), jnp.float32)
        offset = jnp.asarray(rng.randn(1, 5, 5, 18).astype(np.float32) * 0.1)
        mask = jnp.full((1, 5, 5, 9), 0.5, jnp.float32)

        def loss(x, offset, mask, w):
            return jnp.sum(dcn_v2(x, offset, mask, w, b) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, offset, mask, w)
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g)))
            assert float(jnp.abs(g).max()) > 0
