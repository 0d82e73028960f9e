"""Eval-harness completion tests: MobilePose lifting, GT-scale re-PnP,
CenterPose-initialization seeding."""

import numpy as np
import pytest

from centerpose_tpu.config import CenterPoseConfig
from centerpose_tpu.evaluation.evaluator import (
    Evaluator,
    GroundTruthInstance,
    _detector_pre_dets,
    _mobilepose_lift_boxes,
)
from centerpose_tpu.evaluation.mobilepose import _GL_SWAP, lift_2d_to_3d

CAMERA = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]])
W, H = 640, 480


def _box_pts(scale, yaw, t):
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    local = np.array(
        [[sx, sy, sz] for sx in (-0.5, 0.5) for sy in (-0.5, 0.5)
         for sz in (-0.5, 0.5)]
    ) * np.asarray(scale)
    return local @ rot.T + np.asarray(t), rot


def _project_px(pts):
    z = pts[:, 2]
    return np.stack(
        [CAMERA[0, 0] * pts[:, 0] / z + CAMERA[0, 2],
         CAMERA[1, 1] * pts[:, 1] / z + CAMERA[1, 2]], axis=-1,
    )


class TestLift2DTo3D:
    def test_reprojection_hits_input_corners(self):
        # The defining property: the lifted 3D box reprojects exactly onto the
        # 8 detected corners (eval_image_official.py:805-862 semantics).
        pts, _ = _box_pts([0.3, 0.5, 0.2], yaw=0.4, t=[0.1, -0.05, 2.0])
        kps_px = _project_px(pts)
        proj9, pts3d_gl = lift_2d_to_3d(kps_px, CAMERA, W, H)
        got = np.stack([proj9[1:, 0] * W, proj9[1:, 1] * H], axis=-1)
        np.testing.assert_allclose(got, kps_px, atol=0.25)

    def test_lifted_3d_is_gt_up_to_scale(self):
        pts, _ = _box_pts([0.3, 0.5, 0.2], yaw=0.4, t=[0.1, -0.05, 2.0])
        kps_px = _project_px(pts)
        _, pts3d_gl = lift_2d_to_3d(kps_px, CAMERA, W, H)
        pts_gl_gt = pts @ _GL_SWAP.T
        # Up-to-scale: normalize both by centroid depth and compare corners.
        a = pts3d_gl[1:] / np.abs(pts3d_gl[0, 2])
        b = pts_gl_gt / np.abs(pts_gl_gt.mean(axis=0)[2])
        np.testing.assert_allclose(a, b, atol=5e-3)

    def test_lift_boxes_wrapper(self):
        pts, _ = _box_pts([0.3, 0.5, 0.2], yaw=0.1, t=[0.0, 0.0, 2.0])
        kps_px = _project_px(pts)
        det = {"kps": kps_px.reshape(-1), "score": 0.9}
        boxes = [(np.zeros((9, 2)), np.zeros((9, 3)), np.ones(3),
                  np.zeros((9, 2)), det)]
        out = _mobilepose_lift_boxes(boxes, CAMERA, W, H)
        assert len(out) == 1
        proj9, pts3d, scale, kps9, det2 = out[0]
        assert proj9.shape == (9, 2) and pts3d.shape == (9, 3)
        assert det2 is det  # detection dict passes through


class TestGtScaleRePnp:
    def test_evaluate_image_applies_re_pnp_after_matching(self):
        cfg = CenterPoseConfig(category="chair")
        ev = Evaluator(cfg, eval_num_symmetry=1)
        pts, rot = _box_pts([0.3, 0.5, 0.2], yaw=0.2, t=[0.0, 0.0, 2.0])
        pts9 = np.vstack([pts.mean(0, keepdims=True), pts])
        kps9 = np.stack([_project_px(pts9)[:, 0] / W,
                         _project_px(pts9)[:, 1] / H], axis=-1)
        gt = GroundTruthInstance(
            kps_2d_norm=kps9, kps_3d_cam=pts9, scale=np.array([0.3, 0.5, 0.2]),
            rotation=rot, translation=np.array([0.0, 0.0, 2.0]),
        )
        calls = []

        def re_pnp(det, gt_scale):
            calls.append(np.asarray(gt_scale))
            return kps9, pts9  # perfect replacement

        box = (kps9 + 0.2, pts9 * 1.5, np.ones(3), kps9, {"score": 0.8})
        ev.evaluate_image([box], [gt], re_pnp=re_pnp)
        assert len(calls) == 1
        np.testing.assert_array_equal(calls[0], gt.scale)
        # The replaced (perfect) geometry must produce a hit at IoU 0.5.
        aps = ev.compute_aps()
        assert aps["iou3d"][10] == 1.0  # threshold 0.5
        assert aps["add"][2] == 1.0     # 0.1 m


class TestCenterPoseInitSeeds:
    def test_detector_pre_dets_format(self):
        # Seeds are built from the PnP-projected cuboid (proj9, normalized
        # 9x2 — eval_video_official.py:338-380), scaled to pixels, with the
        # reference's full near-zero-uncertainty seed field template so
        # init_track builds a Kalman filter for every seed.
        width, height = 640, 480
        rng = np.random.RandomState(0)
        proj9 = rng.uniform(0.2, 0.8, size=(9, 2))
        det = {"kps": rng.uniform(0, 640, size=16), "score": 0.7}
        boxes = [(proj9, None, np.array([1.0, 1.2, 0.8]), None, det)]
        seeds = _detector_pre_dets(boxes, width, height)
        assert len(seeds) == 1
        s = seeds[0]
        for key in ("score", "cls", "bbox", "ct", "kps", "tracking",
                    "tracking_hp", "obj_scale", "obj_scale_uncertainty",
                    "kps_fusion_mean", "kps_fusion_std", "kps_heatmap_mean",
                    "kps_heatmap_std", "kps_heatmap_height",
                    "kps_displacement_mean", "kps_displacement_std"):
            assert key in s, key
        assert s["score"] == 1.0  # reference seeds carry score 1
        assert s["kps"].shape == (16,)
        expected = proj9[1:].copy()
        expected[:, 0] *= width
        expected[:, 1] *= height
        np.testing.assert_allclose(s["kps"], expected.reshape(-1))
        np.testing.assert_allclose(s["kps_fusion_mean"], s["kps"])
        np.testing.assert_allclose(s["obj_scale_uncertainty"], np.ones(3) * 1e-4)
        assert s["bbox"][0] <= s["ct"][0] <= s["bbox"][2]
