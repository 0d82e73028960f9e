import numpy as np
import pytest

import jax.numpy as jnp

from centerpose_tpu.geometry.cuboid import cuboid_vertices
from centerpose_tpu.ops.pnp import (
    rodrigues,
    rotation_to_quaternion,
    solve_pnp_batch,
    solve_pnp_single,
)

CAMERA = np.array(
    [[600.0, 0.0, 320.0], [0.0, 600.0, 240.0], [0.0, 0.0, 1.0]], np.float32
)


def _random_pose(rng, depth=3.0):
    angle = rng.uniform(0.2, 1.2)
    axis = rng.randn(3)
    axis /= np.linalg.norm(axis)
    rvec = axis * angle
    r = np.asarray(rodrigues(jnp.asarray(rvec, jnp.float32)))
    t = np.array([rng.uniform(-0.5, 0.5), rng.uniform(-0.3, 0.3), depth])
    return r, t


def _project_np(points3d, r, t, camera=CAMERA):
    pc = points3d @ r.T + t
    return np.stack(
        [
            camera[0, 0] * pc[:, 0] / pc[:, 2] + camera[0, 2],
            camera[1, 1] * pc[:, 1] / pc[:, 2] + camera[1, 2],
        ],
        axis=-1,
    )


class TestRotationHelpers:
    def test_rodrigues_roundtrip(self):
        rng = np.random.RandomState(0)
        for _ in range(5):
            axis = rng.randn(3)
            axis /= np.linalg.norm(axis)
            rvec = axis * rng.uniform(0.1, 2.5)
            r = np.asarray(rodrigues(jnp.asarray(rvec, jnp.float32)))
            assert np.allclose(r @ r.T, np.eye(3), atol=1e-5)
            assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-5)

    def test_quaternion_unit_and_consistent(self):
        rng = np.random.RandomState(1)
        axis = rng.randn(3)
        axis /= np.linalg.norm(axis)
        rvec = jnp.asarray(axis * 0.7, jnp.float32)
        r = rodrigues(rvec)
        q = np.asarray(rotation_to_quaternion(r))
        assert np.linalg.norm(q) == pytest.approx(1.0, abs=1e-5)
        # Rebuild R from q and compare.
        x, y, z, w = q
        r_back = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ]
        )
        np.testing.assert_allclose(r_back, np.asarray(r), atol=1e-4)


class TestSolvePnP:
    def test_recovers_exact_pose_8pt(self):
        rng = np.random.RandomState(2)
        cuboid = cuboid_vertices((0.4, 1.0, 0.6))
        r_gt, t_gt = _random_pose(rng)
        pts2d = _project_np(cuboid, r_gt, t_gt)

        res = solve_pnp_single(
            jnp.asarray(pts2d, jnp.float32),
            jnp.asarray(cuboid, jnp.float32),
            jnp.asarray(CAMERA),
        )
        assert bool(res.valid)
        np.testing.assert_allclose(np.asarray(res.translation), t_gt, atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.rotation), r_gt, atol=5e-3)
        assert float(res.reproj_error) < 0.5

    def test_16pt_interleaved_with_invalid_sentinels(self):
        # rep_mode 1: 16 points [disp, heat] per corner; heatmap entries invalid.
        rng = np.random.RandomState(3)
        cuboid = cuboid_vertices((0.5, 1.0, 0.8))
        r_gt, t_gt = _random_pose(rng)
        disp = _project_np(cuboid, r_gt, t_gt)
        pts16 = np.full((16, 2), -10000.0, np.float32)
        pts16[0::2] = disp  # displacement slots valid, heatmap slots invalid
        res = solve_pnp_single(
            jnp.asarray(pts16), jnp.asarray(cuboid, jnp.float32), jnp.asarray(CAMERA)
        )
        assert bool(res.valid)
        np.testing.assert_allclose(np.asarray(res.translation), t_gt, atol=1e-2)

    def test_noisy_points_reasonable(self):
        rng = np.random.RandomState(4)
        cuboid = cuboid_vertices((0.4, 1.0, 0.6))
        r_gt, t_gt = _random_pose(rng)
        pts2d = _project_np(cuboid, r_gt, t_gt) + rng.randn(8, 2) * 1.5
        res = solve_pnp_single(
            jnp.asarray(pts2d, jnp.float32),
            jnp.asarray(cuboid, jnp.float32),
            jnp.asarray(CAMERA),
        )
        assert bool(res.valid)
        assert np.linalg.norm(np.asarray(res.translation) - t_gt) < 0.15
        assert float(res.reproj_error) < 5.0

    def test_too_few_points_invalid(self):
        # 3 valid points < min_required_points=4 (cuboid_pnp_solver.py:157).
        cuboid = cuboid_vertices((1, 1, 1))
        pts = np.full((8, 2), -10000.0, np.float32)
        pts[:3] = [[100, 100], [200, 100], [200, 200]]
        res = solve_pnp_single(
            jnp.asarray(pts), jnp.asarray(cuboid, jnp.float32), jnp.asarray(CAMERA)
        )
        assert not bool(res.valid)

    @pytest.mark.parametrize("n_valid", [4, 5])
    def test_epnp_recovers_pose_from_few_points(self, n_valid):
        # The reference solves 4/5-point sets via SOLVEPNP_EPNP
        # (cuboid_pnp_solver.py:163-165); the old >=6 gate silently dropped
        # these. Use a non-coplanar corner subset of a true projection.
        rng = np.random.RandomState(7)
        cuboid = cuboid_vertices((0.4, 0.6, 0.3)).astype(np.float32)
        keep = [0, 3, 5, 6, 2][:n_valid]   # tetrahedral-ish spread
        for trial in range(3):
            r_gt, t_gt = _random_pose(rng)
            pts = np.full((8, 2), -10000.0, np.float32)
            proj = _project_np(cuboid, r_gt, t_gt)
            pts[keep] = proj[keep]
            res = solve_pnp_single(
                jnp.asarray(pts), jnp.asarray(cuboid), jnp.asarray(CAMERA)
            )
            assert bool(res.valid), f"trial {trial}: EPnP solve flagged invalid"
            # Pose check: reprojection of the kept corners is the robust
            # criterion (few-point P4P can have near-ambiguities).
            reproj = np.asarray(res.projected)
            err = np.linalg.norm(reproj[keep] - proj[keep], axis=-1).max()
            assert err < 1.0, f"trial {trial}: reproj err {err:.2f}px"
            assert np.linalg.norm(np.asarray(res.translation) - t_gt) < 0.15

    def test_opengl_conversion(self):
        rng = np.random.RandomState(5)
        cuboid = cuboid_vertices((0.4, 1.0, 0.6))
        r_gt, t_gt = _random_pose(rng)
        pts2d = _project_np(cuboid, r_gt, t_gt)
        res = solve_pnp_single(
            jnp.asarray(pts2d, jnp.float32),
            jnp.asarray(cuboid, jnp.float32),
            jnp.asarray(CAMERA),
        )
        # x <-> y swap, z negated (cuboid_pnp_solver.py:184-189).
        t_cv = np.asarray(res.translation)
        t_gl = np.asarray(res.translation_gl)
        np.testing.assert_allclose(t_gl, [t_cv[1], t_cv[0], -t_cv[2]], atol=1e-6)

    def test_batched_matches_single(self):
        rng = np.random.RandomState(6)
        cuboid = cuboid_vertices((0.4, 1.0, 0.6))
        all_pts, all_cub = [], []
        poses = []
        for _ in range(4):
            r_gt, t_gt = _random_pose(rng)
            poses.append((r_gt, t_gt))
            all_pts.append(_project_np(cuboid, r_gt, t_gt))
            all_cub.append(cuboid)
        res = solve_pnp_batch(
            jnp.asarray(np.stack(all_pts), jnp.float32),
            jnp.asarray(np.stack(all_cub), jnp.float32),
            jnp.asarray(CAMERA),
        )
        assert res.translation.shape == (4, 3)
        for i, (r_gt, t_gt) in enumerate(poses):
            assert bool(res.valid[i])
            np.testing.assert_allclose(
                np.asarray(res.translation[i]), t_gt, atol=1e-2
            )

    def test_projected_points_match_input(self):
        rng = np.random.RandomState(7)
        cuboid = cuboid_vertices((0.4, 1.0, 0.6))
        r_gt, t_gt = _random_pose(rng)
        pts2d = _project_np(cuboid, r_gt, t_gt)
        res = solve_pnp_single(
            jnp.asarray(pts2d, jnp.float32),
            jnp.asarray(cuboid, jnp.float32),
            jnp.asarray(CAMERA),
        )
        np.testing.assert_allclose(np.asarray(res.projected), pts2d, atol=0.3)


class TestLMOptimality:
    def test_solution_is_stationary_point(self):
        """At the LM solution the reprojection-error gradient is ~0 — the same
        local-optimum criterion cv2's ITERATIVE refinement satisfies."""
        import jax
        import jax.numpy as jnp

        from centerpose_tpu.ops.pnp import _project, rodrigues

        rng = np.random.RandomState(11)
        cuboid = cuboid_vertices((0.4, 1.0, 0.6))
        r_gt, t_gt = _random_pose(rng)
        pts2d = _project_np(cuboid, r_gt, t_gt) + rng.randn(8, 2) * 1.0

        res = solve_pnp_single(
            jnp.asarray(pts2d, jnp.float32),
            jnp.asarray(cuboid, jnp.float32),
            jnp.asarray(CAMERA),
        )

        # Parametrize around the solution with the solver's own chart: a LEFT
        # rotation perturbation exp(δ)·R* and the translation. Stationary ⇒
        # gradient ~0 at (δ=0, t*).
        params = jnp.concatenate([jnp.zeros(3), res.translation])

        def cost(p):
            r = rodrigues(p[:3]) @ jnp.asarray(res.rotation)
            proj = _project(
                jnp.asarray(cuboid, jnp.float32), r, p[3:],
                jnp.asarray(CAMERA),
            )
            return jnp.sum((proj - jnp.asarray(pts2d, jnp.float32)) ** 2)

        g = np.asarray(jax.grad(cost)(params))
        # Gradient scale: cost ~ O(10²) px²; stationary within LM tolerance.
        assert np.abs(g).max() < 2.0, g


class TestPaddedBatch:
    def test_padded_matches_unpadded(self):
        """solve_pnp_batch_padded pads M to a power of two (serving retrace
        guard) and returns results identical to the direct solve."""
        import jax.numpy as jnp
        from scipy.spatial.transform import Rotation

        from centerpose_tpu.ops.pnp import solve_pnp_batch_padded

        rng = np.random.RandomState(0)
        camera = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
        for m in (1, 3, 5):
            cuboids, points = [], []
            for i in range(m):
                scale = rng.uniform(0.5, 1.5, 3)
                cub = cuboid_vertices(scale / scale[1])
                r = Rotation.from_euler(
                    "xyz", rng.uniform(-0.8, 0.8, 3)
                ).as_matrix()
                t = np.array([rng.uniform(-0.2, 0.2),
                              rng.uniform(-0.2, 0.2), rng.uniform(2, 4)])
                pc = cub @ r.T + t
                uv = np.stack(
                    [camera[0, 0] * pc[:, 0] / pc[:, 2] + camera[0, 2],
                     camera[1, 1] * pc[:, 1] / pc[:, 2] + camera[1, 2]], -1
                )
                cuboids.append(cub)
                points.append(uv)
            p = jnp.asarray(np.stack(points), jnp.float32)
            c = jnp.asarray(np.stack(cuboids), jnp.float32)
            cam = jnp.asarray(camera, jnp.float32)
            res_p = solve_pnp_batch_padded(p, c, cam)
            res_d = solve_pnp_batch(p, c, cam)
            assert res_p.valid.shape[0] == m
            assert bool(res_p.valid.all())
            np.testing.assert_allclose(
                np.asarray(res_p.translation), np.asarray(res_d.translation),
                atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(res_p.projected), np.asarray(res_d.projected),
                atol=1e-2,
            )

    def test_per_object_cameras_match_individual_solves(self):
        """camera may be [K, 3, 3]: the serving path concatenates boxes from
        MANY images (different intrinsics) into one padded device solve
        (Detector.run_pnp_multi). Each row must match the single-camera
        solve with its own intrinsics."""
        import jax.numpy as jnp

        from centerpose_tpu.ops.pnp import solve_pnp_batch_padded

        rng = np.random.RandomState(3)
        cameras = [
            np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]]),
            np.array([[300.0, 0, 160], [0, 330.0, 120], [0, 0, 1]]),
            np.array([[800.0, 0, 400], [0, 800.0, 300], [0, 0, 1]]),
        ]
        cuboids, points, poses = [], [], []
        for cam in cameras:
            r_gt, t_gt = _random_pose(rng)
            cub = cuboid_vertices(rng.uniform(0.5, 1.5, 3))
            cuboids.append(cub)
            points.append(_project_np(cub, r_gt, t_gt, camera=cam))
            poses.append((r_gt, t_gt))
        res_multi = solve_pnp_batch_padded(
            jnp.asarray(np.stack(points), jnp.float32),
            jnp.asarray(np.stack(cuboids), jnp.float32),
            jnp.asarray(np.stack(cameras), jnp.float32),
        )
        assert bool(np.asarray(res_multi.valid).all())
        for i, cam in enumerate(cameras):
            res_i = solve_pnp_batch_padded(
                jnp.asarray(points[i][None], jnp.float32),
                jnp.asarray(cuboids[i][None], jnp.float32),
                jnp.asarray(cam, jnp.float32),
            )
            np.testing.assert_allclose(
                np.asarray(res_multi.translation[i]),
                np.asarray(res_i.translation[0]), atol=1e-4,
            )
            np.testing.assert_allclose(
                np.asarray(res_multi.quaternion[i]),
                np.asarray(res_i.quaternion[0]), atol=1e-3,
            )
