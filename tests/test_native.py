"""Native C++ kernels vs their Python/JAX reference implementations."""

import numpy as np
import pytest

from centerpose_tpu.native import (
    dcn_forward_native,
    get_lib,
    iou3d_native,
    iou3d_sweep_native,
)

pytestmark = pytest.mark.skipif(get_lib() is None, reason="g++ unavailable")


def _pose(rng, yaw=None):
    yaw = rng.uniform(0, 2 * np.pi) if yaw is None else yaw
    c, s = np.cos(yaw), np.sin(yaw)
    r = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    t = rng.uniform(-0.5, 0.5, 3)
    sc = rng.uniform(0.3, 1.5, 3)
    return r, t, sc


class TestNativeIoU:
    def test_identical(self):
        r = np.eye(3)
        t = np.zeros(3)
        s = np.ones(3)
        assert iou3d_native(r, t, s, r, t, s) == pytest.approx(1.0, abs=1e-6)

    def test_matches_python_random_pairs(self):
        from centerpose_tpu.evaluation.iou3d import OrientedBox, box_iou_3d

        rng = np.random.RandomState(0)
        for _ in range(30):
            r1, t1, s1 = _pose(rng)
            r2, t2, s2 = _pose(rng)
            native = iou3d_native(r1, t1, s1, r2, t2, s2)
            python = box_iou_3d(
                OrientedBox(r1, t1, s1), OrientedBox(r2, t2, s2), use_native=False
            )
            assert native == pytest.approx(python, abs=2e-3), (native, python)

    def test_disjoint(self):
        r = np.eye(3)
        s = np.ones(3)
        assert iou3d_native(r, np.zeros(3), s, r, np.array([5.0, 0, 0]), s) == 0.0

    def test_sweep_recovers_yaw(self):
        rng = np.random.RandomState(1)
        r1, t, _ = _pose(rng, yaw=0.0)
        s = np.array([0.4, 1.0, 0.8])
        r2, _, _ = _pose(rng, yaw=np.pi / 2)
        raw = iou3d_native(r1, t, s, r2, t, s)
        swept = iou3d_sweep_native(r1, t, s, r2, t, s, 4)
        assert raw < 0.9
        assert swept == pytest.approx(1.0, abs=1e-5)


class TestNativeDCN:
    def test_matches_jax_dcn(self):
        import jax.numpy as jnp

        from centerpose_tpu.ops.dcn import dcn_v2

        rng = np.random.RandomState(2)
        x = rng.randn(2, 7, 7, 4).astype(np.float32)
        offset = (rng.randn(2, 7, 7, 18) * 0.7).astype(np.float32)
        mask = rng.rand(2, 7, 7, 9).astype(np.float32)
        w = (rng.randn(3, 3, 4, 5) * 0.2).astype(np.float32)
        b = rng.randn(5).astype(np.float32)

        native = dcn_forward_native(x, offset, mask, w, b)
        jax_out = np.asarray(
            dcn_v2(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
                   jnp.asarray(w), jnp.asarray(b))
        )
        np.testing.assert_allclose(native, jax_out, atol=2e-4)

    def test_zero_offset_is_conv(self):
        rng = np.random.RandomState(3)
        x = rng.randn(1, 6, 6, 2).astype(np.float32)
        offset = np.zeros((1, 6, 6, 18), np.float32)
        mask = np.ones((1, 6, 6, 9), np.float32)
        w = rng.randn(3, 3, 2, 3).astype(np.float32)
        b = np.zeros(3, np.float32)
        native = dcn_forward_native(x, offset, mask, w, b)

        import jax
        import jax.numpy as jnp

        conv = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(native, np.asarray(conv), atol=1e-4)
