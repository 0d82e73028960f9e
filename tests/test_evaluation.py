import numpy as np
import pytest

from centerpose_tpu.evaluation.iou3d import (
    OrientedBox,
    box_iou_3d,
    iou_with_symmetry_sweep,
)
from centerpose_tpu.evaluation.metrics import (
    THRESH_3D_IOU,
    AveragePrecision,
    HitMiss,
    add_metric,
    adds_metric,
    azimuth_polar_error,
    pixel_error_2d,
    scale_error,
)


def _box(t=(0, 0, 0), s=(1, 1, 1), yaw=0.0):
    c, sn = np.cos(yaw), np.sin(yaw)
    r = np.array([[c, 0, sn], [0, 1, 0], [-sn, 0, c]])
    return OrientedBox(rotation=r, translation=np.asarray(t, float), scale=np.asarray(s, float))


class TestIoU3D:
    def test_identical_boxes(self):
        assert box_iou_3d(_box(), _box()) == pytest.approx(1.0, abs=1e-6)

    def test_disjoint(self):
        assert box_iou_3d(_box(), _box(t=(5, 0, 0))) == 0.0

    def test_half_overlap_axis_aligned(self):
        # Shift by half width: intersection 0.5, union 1.5 -> IoU = 1/3.
        iou = box_iou_3d(_box(), _box(t=(0.5, 0, 0)))
        assert iou == pytest.approx(1 / 3, abs=1e-6)

    def test_contained_box(self):
        small = _box(s=(0.5, 0.5, 0.5))
        iou = box_iou_3d(_box(), small)
        assert iou == pytest.approx(0.125, abs=1e-6)

    def test_rotated_45_known_value(self):
        # Unit cubes, one rotated 45° about y: intersection is a regular octagon
        # prism: area = 2*(sqrt(2)-1)... use known IoU for 2D squares at 45°:
        # inter = 8*(sqrt(2)-1)/... simpler: verify symmetry + bounds.
        iou = box_iou_3d(_box(), _box(yaw=np.pi / 4))
        iou_rev = box_iou_3d(_box(yaw=np.pi / 4), _box())
        assert iou == pytest.approx(iou_rev, abs=1e-6)
        # Exact: 2D square-vs-rotated-square intersection area = 4*(sqrt(2)-1)
        # for unit squares → IoU_2d = (4*(sqrt(2)-1) - 1) ... compute directly:
        # known result: area_int = 4*(sqrt(2)-1) * (1/2)^2 * 2 = ...
        # Use the sampled reference value instead:
        assert 0.7 < iou < 0.75  # octagon overlap of unit squares ≈ 0.7071/0.9654

    def test_yaw_90_symmetric_cube(self):
        iou = box_iou_3d(_box(), _box(yaw=np.pi / 2))
        assert iou == pytest.approx(1.0, abs=1e-5)

    def test_symmetry_sweep_recovers_rotation(self):
        # A cuboid with distinct x/z extents rotated 90°: raw IoU < 1, sweep = 1.
        a = _box(s=(0.4, 1.0, 0.8))
        b = _box(s=(0.4, 1.0, 0.8), yaw=np.pi / 2)
        raw = box_iou_3d(a, b)
        swept = iou_with_symmetry_sweep(a, b, num_rotations=4)
        assert raw < 0.9
        assert swept == pytest.approx(1.0, abs=1e-5)

    def test_fit_from_corners_roundtrip(self):
        box = _box(t=(0.3, -0.2, 2.0), s=(0.4, 1.0, 0.6), yaw=0.7)
        fitted = OrientedBox.from_corners_fit(box.corners())
        assert box_iou_3d(box, fitted) == pytest.approx(1.0, abs=1e-4)


class TestAP:
    def test_perfect_detector(self):
        hm = HitMiss(THRESH_3D_IOU)
        for _ in range(10):
            hm.record_hit_miss(0.9, conf=0.8)  # IoU 0.9 everywhere
        ap = AveragePrecision(num_gt=10)
        assert ap.at_threshold(hm, 0.5) == pytest.approx(1.0)
        assert ap.at_threshold(hm, 0.95) == pytest.approx(0.0)

    def test_confidence_ranking_matters(self):
        # One high-conf hit + one low-conf miss: AP should stay high (hit ranked
        # first).
        hm = HitMiss(THRESH_3D_IOU)
        hm.record_hit_miss(0.9, conf=0.9)
        hm.record_hit_miss(0.1, conf=0.1)
        ap = AveragePrecision(num_gt=1)
        assert ap.at_threshold(hm, 0.5) == pytest.approx(1.0)

        # Reversed confidences: the miss outranks the hit; precision at the hit
        # is 0.5 -> AP 0.5.
        hm2 = HitMiss(THRESH_3D_IOU)
        hm2.record_hit_miss(0.9, conf=0.1)
        hm2.record_hit_miss(0.1, conf=0.9)
        ap2 = AveragePrecision(num_gt=1)
        assert ap2.at_threshold(hm2, 0.5) == pytest.approx(0.5)

    def test_missed_gt_lowers_recall(self):
        hm = HitMiss(THRESH_3D_IOU)
        for _ in range(5):
            hm.record_hit_miss(0.9, conf=0.8)
        ap = AveragePrecision(num_gt=10)  # 5 more GT never detected
        assert ap.at_threshold(hm, 0.5) == pytest.approx(0.5)

    def test_duplicate_matches_overflow_like_reference(self):
        # The greedy matcher is not one-to-one: 8 hit predictions against 6 GT
        # push recall to 8/6 and AP above 1.0. The reference behaves the same
        # (metrics_nvidia.py:80-101 terminal point contributes zero envelope
        # area) — this pins the parity quirk so nobody "fixes" one side only.
        hm = HitMiss(THRESH_3D_IOU)
        for _ in range(8):
            hm.record_hit_miss(0.9, conf=0.8)
        ap = AveragePrecision(num_gt=6)
        assert ap.at_threshold(hm, 0.5) == pytest.approx(8.0 / 6.0)


class TestMetricDefs:
    def test_scale_error_zero(self):
        assert scale_error([1, 2, 3], [2, 4, 6]) == pytest.approx(0.0)  # same ratios

    def test_scale_error_positive(self):
        assert scale_error([1, 1, 1], [1, 1, 2]) > 0

    def test_scale_error_is_summed(self):
        # evaluate_scale uses np.sum over the 3 height-normalized dims
        # (eval_image_official.py:668), not a mean.
        err = scale_error([1.1, 1.0, 1.0], [1.0, 1.0, 1.0])
        assert err == pytest.approx(0.1, abs=1e-9)
        err3 = scale_error([1.1, 1.0, 1.1], [1.0, 1.0, 1.0])
        assert err3 == pytest.approx(0.2, abs=1e-9)

    def test_pixel_error_zero(self):
        kps = np.random.RandomState(0).rand(9, 2)
        assert pixel_error_2d(kps, kps) == pytest.approx(0.0)

    def test_pixel_error_excludes_center(self):
        # The reference averages over box[1:] (the 8 corners) only.
        kps = np.random.RandomState(0).rand(9, 2)
        moved = kps.copy()
        moved[0] += 10.0  # perturb only the center
        assert pixel_error_2d(moved, kps) == pytest.approx(0.0)

    def test_pixel_error_symmetry_sweep_permutation(self):
        rng = np.random.RandomState(1)
        kps = rng.rand(9, 2)
        # Permute the GT rings by one +90° y-rotation step (1→2→6→5, 3→4→8→7):
        # swept error ~ 0 under the label-permutation fallback.
        bottom = [1, 2, 6, 5]
        top = [3, 4, 8, 7]
        perm = np.arange(9)
        for src, dst in zip(bottom, np.roll(bottom, -1)):
            perm[src] = dst
        for src, dst in zip(top, np.roll(top, -1)):
            perm[src] = dst
        permuted = kps[perm]
        assert pixel_error_2d(kps, permuted, num_symmetry=4) == pytest.approx(
            0.0, abs=1e-9
        )
        assert pixel_error_2d(kps, permuted, num_symmetry=1) > 0.01

    def test_pixel_error_reprojection_sweep(self):
        # With 3D GT + Mo2c available, the sweep rotates the 3D box about its
        # local y axis and reprojects (reference evaluate_2d semantics). A pred
        # that equals the GT rotated by 2π/12 must score ~0 at num_symmetry=12
        # (a label permutation cannot express a 30° rotation).
        rng = np.random.RandomState(2)
        scale = np.array([0.4, 0.7, 0.4])
        rot = _box(yaw=0.3).rotation
        t = np.array([0.05, -0.02, -1.5])
        corners_local = (
            np.array(
                [[0, 0, 0]]
                + [
                    [sx, sy, sz]
                    for sx in (-0.5, 0.5)
                    for sy in (-0.5, 0.5)
                    for sz in (-0.5, 0.5)
                ]
            )
            * scale
        )
        pts_cam = corners_local @ rot.T + t
        # Simple pinhole: normalized uv = (x / -z, y / -z) * f + c.
        def project(p):
            return np.stack(
                [0.8 * p[:, 0] / -p[:, 2] + 0.5, 0.8 * p[:, 1] / -p[:, 2] + 0.5],
                axis=1,
            )

        gt2d = project(pts_cam)
        mo2c = np.eye(4)
        mo2c[:3, :3] = rot
        mo2c[:3, 3] = t
        theta = 2 * np.pi / 12
        ry = np.array(
            [
                [np.cos(theta), 0, np.sin(theta)],
                [0, 1, 0],
                [-np.sin(theta), 0, np.cos(theta)],
            ]
        )
        pts_rot = (corners_local @ ry.T) @ rot.T + t
        pred2d = project(pts_rot)
        err12 = pixel_error_2d(
            pred2d, gt2d, num_symmetry=12, kps_gt_3d=pts_cam, Mo2c=mo2c
        )
        err1 = pixel_error_2d(
            pred2d, gt2d, num_symmetry=1, kps_gt_3d=pts_cam, Mo2c=mo2c
        )
        assert err12 == pytest.approx(0.0, abs=1e-8)
        assert err1 > 1e-3

    def test_add_metrics(self):
        p = np.zeros((8, 3))
        g = np.ones((8, 3))
        assert add_metric(p, g) == pytest.approx(np.sqrt(3))
        assert adds_metric(p, p + 0.001) < 0.01

    def test_azimuth_polar_zero_for_same_pose(self):
        r = _box(yaw=0.5).rotation
        t = np.array([0.1, 0.2, -2.0])
        az, po = azimuth_polar_error(r, r, t_pred=t, t_gt=t)
        assert az == pytest.approx(0.0, abs=1e-6)
        assert po == pytest.approx(0.0, abs=1e-6)

    def test_azimuth_symmetry_fold(self):
        # A 90° yaw at fixed camera position folds to 0 under num_symmetry=4
        # via the reference's |Δ| % (360/n) (evaluate_viewpoint), and to 30°
        # fold residual 0 under n=12 for a 30° yaw.
        r1 = _box(yaw=0.0).rotation
        r2 = _box(yaw=np.pi / 2).rotation
        t = np.array([0.0, 0.0, -2.0])
        az_raw, _ = azimuth_polar_error(r1, r2, num_symmetry=1, t_pred=t, t_gt=t)
        az_fold, _ = azimuth_polar_error(r1, r2, num_symmetry=4, t_pred=t, t_gt=t)
        assert az_raw == pytest.approx(90.0, abs=1e-4)
        assert az_fold == pytest.approx(0.0, abs=1e-4)

    def test_azimuth_fold_large_symmetry(self):
        # num_symmetry=100 (bottle/cup default): residual error is the exact
        # modulo fold, ≤ 1.8°, with no 36-rotation quantization.
        r1 = _box(yaw=0.0).rotation
        r2 = _box(yaw=np.radians(10.0)).rotation
        t = np.array([0.0, 0.0, -2.0])
        az, _ = azimuth_polar_error(r1, r2, num_symmetry=100, t_pred=t, t_gt=t)
        assert az == pytest.approx(10.0 % 3.6, abs=1e-4)
