import numpy as np
import pytest

from centerpose_tpu.geometry import (
    CUBOID_EDGES,
    affine_transform,
    affine_transform_points,
    cuboid_vertices,
    draw_gaussian,
    gaussian_radius,
    get_affine_transform,
    transform_preds,
    warp_affine,
)
from centerpose_tpu.geometry.cuboid import normalized_cuboid


class TestAffine:
    def test_center_maps_to_output_center(self):
        t = get_affine_transform([100, 80], 200.0, 0, (512, 512))
        out = affine_transform([100, 80], t)
        np.testing.assert_allclose(out, [256, 256], atol=1e-5)

    def test_scale(self):
        # A crop of width `scale` maps onto output width.
        t = get_affine_transform([100, 80], 200.0, 0, (512, 512))
        left = affine_transform([0, 80], t)
        right = affine_transform([200, 80], t)
        np.testing.assert_allclose(right[0] - left[0], 512, atol=1e-4)

    def test_inverse_roundtrip(self):
        t = get_affine_transform([123, 77], 313.0, 25.0, (512, 512))
        t_inv = get_affine_transform([123, 77], 313.0, 25.0, (512, 512), inv=True)
        pts = np.array([[10.0, 20.0], [400.0, 300.0], [256.0, 256.0]])
        fwd = affine_transform_points(pts, t)
        back = affine_transform_points(fwd, t_inv)
        np.testing.assert_allclose(back, pts, atol=1e-3)

    def test_rotation(self):
        # 90-degree rotation: the up direction in src maps to up in dst.
        t = get_affine_transform([0, 0], 100.0, 90.0, (100, 100))
        # src point rotated -90 from up-dir lands on the dst up-dir point
        p = affine_transform([50.0, 0.0], t)  # up-dir rotated by 90 in src space
        np.testing.assert_allclose(p, [50.0, 0.0], atol=1e-4)

    def test_transform_preds_sentinel(self):
        coords = np.array([[10.0, 10.0], [-10000.0, -10000.0]])
        out = transform_preds(coords, np.array([256, 256]), 512.0, (128, 128))
        assert out[1, 0] == -10000 and out[1, 1] == -10000
        assert out[0, 0] != -10000

    def test_transform_preds_matches_inverse_affine(self):
        c, s = np.array([300.0, 200.0]), 640.0
        coords = np.random.RandomState(0).rand(5, 2) * 128
        out = transform_preds(coords, c, s, (128, 128))
        t_inv = get_affine_transform(c, s, 0, (128, 128), inv=True)
        expect = affine_transform_points(coords, t_inv)
        np.testing.assert_allclose(out, expect, atol=1e-6)

    def test_warp_affine_identity(self):
        img = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
        t = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        out = warp_affine(img, t, (16, 16))
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_warp_affine_translation(self):
        img = np.zeros((8, 8), dtype=np.float32)
        img[2, 3] = 1.0
        t = np.array([[1.0, 0.0, 2.0], [0.0, 1.0, 1.0]])  # shift x+2, y+1
        out = warp_affine(img, t, (8, 8))
        assert out[3, 5] == pytest.approx(1.0, abs=1e-6)

    def test_warp_affine_u8_matches_float_warp_interior(self):
        from centerpose_tpu.geometry.affine import (
            get_affine_transform,
            warp_affine_u8,
        )

        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, size=(96, 128, 3), dtype=np.uint8)
        t = get_affine_transform(
            np.array([64.0, 48.0]), 110.0, rot=12.0, output_size=(64, 64)
        )
        fast = warp_affine_u8(img, t, (64, 64))
        assert fast.dtype == np.uint8 and fast.shape == (64, 64, 3)
        ref = warp_affine(img.astype(np.float32), t, (64, 64))
        # PIL's fixed-point resampler truncates and zero-fills where the
        # bilinear support crosses the source border; compare interior pixels
        # whose 4-tap support is fully inside.
        t_full = np.vstack([t, [0, 0, 1]])
        inv = np.linalg.inv(t_full)
        ys, xs = np.mgrid[0:64, 0:64]
        src = inv @ np.stack([xs.ravel(), ys.ravel(), np.ones(64 * 64)])
        interior = (
            (src[0] >= 1) & (src[0] < 126) & (src[1] >= 1) & (src[1] < 94)
        ).reshape(64, 64)
        diff = np.abs(fast.astype(np.float32) - ref)[interior]
        assert diff.max() <= 1.5  # uint8 rounding vs truncation
        assert diff.mean() < 0.6

    def test_warp_affine_u8_float_input_falls_back(self):
        from centerpose_tpu.geometry.affine import warp_affine_u8

        img = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
        t = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        out = warp_affine_u8(img, t, (16, 16))
        np.testing.assert_allclose(out, img, atol=1e-6)


class TestCuboid:
    def test_vertex_order_binary_counting(self):
        v = cuboid_vertices((2.0, 4.0, 6.0))
        # idx 0 = (-x,-y,-z), idx 7 = (+x,+y,+z), x is high bit.
        np.testing.assert_allclose(v[0], [-1, -2, -3])
        np.testing.assert_allclose(v[7], [1, 2, 3])
        np.testing.assert_allclose(v[1], [-1, -2, 3])   # z low bit
        np.testing.assert_allclose(v[4], [1, -2, -3])   # x high bit

    def test_center_prepended(self):
        v = cuboid_vertices((1, 1, 1), include_center=True)
        assert v.shape == (9, 3)
        np.testing.assert_allclose(v[0], [0, 0, 0])

    def test_edges(self):
        assert len(CUBOID_EDGES) == 12

    def test_normalized_by_height(self):
        v = normalized_cuboid([2.0, 4.0, 8.0])
        # height extent becomes 1.0
        assert v[:, 1].max() - v[:, 1].min() == pytest.approx(1.0)
        assert v[:, 0].max() - v[:, 0].min() == pytest.approx(0.5)
        assert v[:, 2].max() - v[:, 2].min() == pytest.approx(2.0)


class TestGaussian:
    def test_radius_positive_monotone(self):
        r_small = gaussian_radius((10, 10))
        r_big = gaussian_radius((100, 100))
        assert 0 < r_small < r_big

    def test_draw_gaussian_peak(self):
        hm = np.zeros((32, 32), dtype=np.float32)
        draw_gaussian(hm, (10, 12), radius=3)
        assert hm[12, 10] == pytest.approx(1.0)
        assert hm.max() == pytest.approx(1.0)
        assert hm[12, 11] < 1.0 and hm[12, 11] > 0.0

    def test_draw_gaussian_max_composite(self):
        hm = np.zeros((32, 32), dtype=np.float32)
        draw_gaussian(hm, (10, 10), radius=4)
        before = hm.copy()
        draw_gaussian(hm, (12, 10), radius=4, k=0.5)
        assert np.all(hm >= before - 1e-7)
        assert hm[10, 12] >= 0.5

    def test_draw_gaussian_clipped_at_border(self):
        hm = np.zeros((16, 16), dtype=np.float32)
        draw_gaussian(hm, (0, 0), radius=3)
        assert hm[0, 0] == pytest.approx(1.0)

    def test_device_render_matches_host_peak(self):
        import jax.numpy as jnp

        from centerpose_tpu.geometry import render_gaussians

        out = render_gaussians(
            centers=jnp.array([[10.0, 12.0], [20.0, 5.0]]),
            radii=jnp.array([3.0, 2.0]),
            amplitudes=jnp.array([1.0, 0.7]),
            valid=jnp.array([True, True]),
            height=32,
            width=32,
        )
        out = np.asarray(out)
        assert out[12, 10] == pytest.approx(1.0, abs=1e-5)
        assert out[5, 20] == pytest.approx(0.7, abs=1e-5)

    def test_device_render_invalid_masked(self):
        import jax.numpy as jnp

        from centerpose_tpu.geometry import render_gaussians

        out = render_gaussians(
            centers=jnp.array([[10.0, 12.0]]),
            radii=jnp.array([3.0]),
            amplitudes=jnp.array([1.0]),
            valid=jnp.array([False]),
            height=16,
            width=16,
        )
        assert float(np.asarray(out).max()) == 0.0


class TestCollision:
    def test_segment_hits_box(self):
        from centerpose_tpu.geometry.collision import segment_intersects_box

        bmin, bmax = np.array([-1, -1, -1.0]), np.array([1, 1, 1.0])
        assert segment_intersects_box([-2, 0, 0], [2, 0, 0], bmin, bmax)
        assert not segment_intersects_box([-2, 2, 0], [2, 2, 0], bmin, bmax)
        assert segment_intersects_box([0, 0, 0], [5, 5, 5], bmin, bmax)  # starts inside
        # Parallel to an axis but outside the slab.
        assert not segment_intersects_box([-2, 0, 3], [2, 0, 3], bmin, bmax)

    def test_oriented_box(self):
        from centerpose_tpu.geometry.collision import (
            segment_intersects_oriented_box,
        )

        c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
        r = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        # Thin box rotated 45°: a ray along x at y=1.2 misses the AABB but
        # orientation matters.
        hit = segment_intersects_oriented_box(
            [-3, 0, 0], [3, 0, 0], r, np.zeros(3), np.array([4.0, 0.2, 1.0])
        )
        assert hit
        miss = segment_intersects_oriented_box(
            [-3, 2.5, 0], [3, 2.5, 0], r, np.zeros(3), np.array([4.0, 0.2, 1.0])
        )
        assert not miss
