"""Parity tests for the Pallas one-hot MXU DCN sampler (ops/dcn_onehot.py).

On CPU the kernel runs in Pallas interpret mode (patched pallas_call); on TPU
the same tests run compiled. Exactness contract: identical to ops/dcn.py
dcn_v2 whenever every |dy| <= radius (including image-boundary corners);
out-of-window taps contribute zero.
"""

import numpy as np
import pytest
from unittest import mock

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import centerpose_tpu.ops.dcn_onehot as oh
from centerpose_tpu.ops.dcn import dcn_v2

_ORIG_PALLAS_CALL = pl.pallas_call


def _interp(*a, **k):
    if jax.default_backend() == "cpu":
        k["interpret"] = True
    return _ORIG_PALLAS_CALL(*a, **k)


@pytest.fixture(autouse=True)
def _interpret_on_cpu():
    with mock.patch.object(pl, "pallas_call", _interp):
        yield


def _rand_case(rng, b, h, w, c, co, off_scale):
    x = rng.randn(b, h, w, c).astype(np.float32)
    offset = (rng.rand(b, h, w, 18).astype(np.float32) * 2 - 1) * off_scale
    mask = rng.rand(b, h, w, 9).astype(np.float32)
    wt = rng.randn(3, 3, c, co).astype(np.float32) * 0.1
    bias = rng.randn(co).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (x, offset, mask, wt, bias))


class TestOneHotParity:
    @pytest.mark.parametrize(
        "b,h,w,c,co,radius,scale",
        [
            (1, 16, 16, 4, 4, 2, 0.0),    # zero offsets == plain conv
            (2, 16, 32, 8, 16, 2, 1.8),   # general offsets within window
            (1, 24, 16, 8, 8, 3, 2.8),    # R=3
            (1, 16, 16, 4, 8, 2, 1.9),    # c != co
        ],
    )
    def test_matches_exact_gather_within_window(
        self, b, h, w, c, co, radius, scale
    ):
        rng = np.random.RandomState(0)
        args = _rand_case(rng, b, h, w, c, co, scale)
        out_k = oh.dcn_v2_onehot(*args, radius)
        out_ref = dcn_v2(*args[:5])
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_ref), atol=2e-5, rtol=1e-5
        )

    def test_boundary_corners_match(self):
        # Offsets pushing samples across every image edge (but |dy| <= R):
        # out-of-image corners contribute zero in both implementations.
        rng = np.random.RandomState(1)
        b, h, w, c, co, r = 1, 16, 16, 4, 4, 3
        x, offset, mask, wt, bias = _rand_case(rng, b, h, w, c, co, 0.0)
        off = np.zeros((b, h, w, 18), np.float32)
        off[:, :2, :, 0::2] = -2.5    # top rows sample above the image
        off[:, -2:, :, 0::2] = 2.5    # bottom rows below
        off[:, :, :2, 1::2] = -2.5    # left columns
        off[:, :, -2:, 1::2] = 2.5    # right columns
        out_k = oh.dcn_v2_onehot(x, jnp.asarray(off), mask, wt, bias, r)
        out_ref = dcn_v2(x, jnp.asarray(off), mask, wt, bias)
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_ref), atol=2e-5, rtol=1e-5
        )

    def test_out_of_window_taps_drop_to_zero(self):
        # One tap's dy exceeds the whole block window for EVERY row — beyond
        # 2R + G + 2, accounting for the image-edge clamp of the window origin
        # (r0 clips to 0 at the top, extending block 0's coverage downward):
        # that tap contributes 0; a reference built by zeroing its mask must
        # match. (For R < dy <= 2R+G+2 the tap may still sample — the block
        # window is shared by G rows — which is MORE coverage than the
        # per-row contract, never less.)
        rng = np.random.RandomState(2)
        b, h, w, c, co, r = 1, 20, 16, 4, 4, 2
        g = oh._pick_block_rows(h, w, c, r, itemsize=4, mrows=2 * c)
        far_dy = float(2 * r + g + 3)
        assert h - 1 + far_dy >= h  # also lands outside the image from row 0
        x, _, mask, wt, bias = _rand_case(rng, b, h, w, c, co, 0.0)
        off = np.zeros((b, h, w, 18), np.float32)
        off[:, :, :, 8] = far_dy      # tap 4 (dy channel 2*4) far out
        m_dropped = np.asarray(mask).copy()
        m_dropped[:, :, :, 4] = 0.0
        out_k = oh.dcn_v2_onehot(x, jnp.asarray(off), mask, wt, bias, r)
        out_ref = dcn_v2(x, jnp.asarray(off), jnp.asarray(m_dropped), wt, bias)
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_ref), atol=2e-5, rtol=1e-5
        )

    def test_gradients_flow(self):
        # custom_vjp backward (exact-op autodiff) produces finite grads for
        # every input.
        rng = np.random.RandomState(3)
        args = _rand_case(rng, 1, 16, 16, 4, 4, 1.5)

        def loss(*a):
            return jnp.sum(oh.dcn_v2_onehot(*a, 2) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g)))
        # Against the exact op's grads (offsets in-window -> identical fwd).
        def loss_ref(*a):
            return jnp.sum(dcn_v2(*a) ** 2)

        grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
        for g, gr in zip(grads, grads_ref):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(gr), atol=1e-4, rtol=1e-4
            )

    def test_model_integration_onehot_impl(self):
        # DeformConvBlock with dcn_impl='onehot' initializes and runs.
        from centerpose_tpu.models.layers import DeformConvBlock

        m = DeformConvBlock(8, dcn_impl="onehot", dcn_window_radius=2)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 4), jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(variables, x)
        assert y.shape == (1, 16, 16, 8)
        # Zero-init offset conv => identical to the gather impl at init.
        m2 = DeformConvBlock(8, dcn_impl="gather")
        y2 = m2.apply(variables, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=2e-5)


class TestWeightedSelector:
    """exact=False (hat-function bilinear selector) — the production bf16 path.
    With f32 inputs the selector carries full-precision weights, so it must
    match the exact gather to float tolerance, including every image edge."""

    def test_matches_exact_gather(self):
        rng = np.random.RandomState(5)
        args = _rand_case(rng, 2, 16, 16, 4, 4, 1.5)
        out_k = oh.dcn_v2_onehot(*args, 2, False)
        out_ref = dcn_v2(*args[:5])
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_ref), atol=3e-5, rtol=1e-5
        )

    def test_boundary_hat_weights(self):
        # Samples pushed across the left/right edges: the hat on the surviving
        # column equals that corner's bilinear weight (other corner zero-pad).
        rng = np.random.RandomState(6)
        x, _, mask, wt, bias = _rand_case(rng, 1, 12, 12, 4, 4, 0.0)
        off = np.zeros((1, 12, 12, 18), np.float32)
        off[:, :, :, 1::2] = 3.7   # dx pushes right corners past the edge
        off[:, :, :, 0::2] = 0.25  # fractional dy inside the window
        out_k = oh.dcn_v2_onehot(x, jnp.asarray(off), mask, wt, bias, 2, False)
        out_ref = dcn_v2(x, jnp.asarray(off), mask, wt, bias)
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_ref), atol=3e-5, rtol=1e-5
        )


class TestGroupedKernel:
    """MXU-packed paths of exact=False: nr row-groups folded into K (W < 128)
    and M-paired rows (C <= 64, W > 64). Both sample EVERY |dy| exactly —
    no window clipping — so they must match the exact gather for any offset."""

    def test_nr_path_large_dy_matches_exact(self):
        # W=16 -> nr=8. |dy| far beyond any radius still samples exactly.
        rng = np.random.RandomState(7)
        x, _, mask, wt, bias = _rand_case(rng, 2, 32, 16, 8, 8, 0.0)
        off = (rng.rand(2, 32, 16, 18).astype(np.float32) * 2 - 1) * 11.0
        out_k = oh.dcn_v2_onehot(x, jnp.asarray(off), mask, wt, bias, 2, False)
        out_ref = dcn_v2(x, jnp.asarray(off), mask, wt, bias)
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_ref), atol=3e-5, rtol=1e-5
        )

    def test_mp_path_matches_exact(self):
        # W=72 (> 64 -> nr=1), C=8 (<= 64) -> M-paired rows.
        rng = np.random.RandomState(8)
        x, off, mask, wt, bias = _rand_case(rng, 1, 10, 72, 8, 8, 2.3)
        out_k = oh.dcn_v2_onehot(x, off, mask, wt, bias, 4, False)
        out_ref = dcn_v2(x, off, mask, wt, bias)
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_ref), atol=3e-5, rtol=1e-5
        )

    def test_mp_path_boundary_rows(self):
        # Samples crossing top/bottom edges through the paired-row loop.
        rng = np.random.RandomState(9)
        x, _, mask, wt, bias = _rand_case(rng, 1, 8, 72, 4, 4, 0.0)
        off = np.zeros((1, 8, 72, 18), np.float32)
        off[:, :2, :, 0::2] = -3.3
        off[:, -2:, :, 0::2] = 3.3
        off[:, :, :, 1::2] = 0.45
        out_k = oh.dcn_v2_onehot(x, jnp.asarray(off), mask, wt, bias, 4, False)
        out_ref = dcn_v2(x, jnp.asarray(off), mask, wt, bias)
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_ref), atol=3e-5, rtol=1e-5
        )

    def test_block_rows_override(self):
        rng = np.random.RandomState(10)
        args = _rand_case(rng, 1, 16, 16, 4, 4, 1.2)
        base = oh.dcn_v2_onehot(*args, 2, False)
        for g in (2, 8, 16):
            out = oh.dcn_v2_onehot(*args, 2, False, g)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(base), atol=3e-5, rtol=1e-5
            )


class TestShapeFallbacks:
    def test_wide_map_falls_back_to_gather(self):
        # W > 128: the resident-selector design doesn't apply; must route to
        # the exact gather (same numerics, no assert).
        rng = np.random.RandomState(11)
        args = _rand_case(rng, 1, 8, 136, 4, 4, 1.5)
        out_k = oh.dcn_v2_onehot(*args, 4, False)
        out_ref = dcn_v2(*args[:5])
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_ref), atol=3e-5, rtol=1e-5
        )

    def test_non_pow2_height_keeps_grouped_packing(self):
        # h=20, w=16: nr=8 doesn't divide 20 but nr=4 does — the grouped path
        # (exact for any |dy|) must be taken, proven by an offset far beyond
        # any radius still matching the exact gather.
        rng = np.random.RandomState(12)
        x, _, mask, wt, bias = _rand_case(rng, 1, 20, 16, 8, 8, 0.0)
        off = np.zeros((1, 20, 16, 18), np.float32)
        off[:, :, :, 0::2] = 9.5
        out_k = oh.dcn_v2_onehot(x, jnp.asarray(off), mask, wt, bias, 2, False)
        out_ref = dcn_v2(x, jnp.asarray(off), mask, wt, bias)
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(out_ref), atol=3e-5, rtol=1e-5
        )

    def test_chunked_backward_matches_whole_batch(self):
        # b=8 > chunk=4 routes _bwd through the lax.map per-chunk vjp; grads
        # must equal the direct whole-batch gather autodiff.
        rng = np.random.RandomState(13)
        args = _rand_case(rng, 8, 8, 16, 4, 4, 1.2)

        def loss(*a):
            return jnp.sum(oh.dcn_v2_onehot(*a, 2, False) ** 2)

        def loss_ref(*a):
            return jnp.sum(dcn_v2(*a) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
        for a, b in zip(g, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
            )
