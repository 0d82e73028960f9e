"""Evaluator integration tests with synthetic GT and detector outputs."""

import json

import numpy as np
import pytest

from centerpose_tpu.config import preset
from centerpose_tpu.evaluation.evaluator import (
    Evaluator,
    GroundTruthInstance,
    compute_plane_scale,
    parse_gt_json,
)
from centerpose_tpu.geometry.cuboid import cuboid_vertices


def _gt(scale=(0.4, 1.0, 0.6), t=(0.1, -0.2, 1.5), yaw=0.3):
    c, s = np.cos(yaw), np.sin(yaw)
    r = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    corners = cuboid_vertices(scale) @ r.T + np.asarray(t)
    kps3d = np.vstack([corners.mean(0, keepdims=True), corners])
    kps2d = kps3d[:, :2] / kps3d[:, 2:3] * 0.5 + 0.5  # fake normalized projection
    return GroundTruthInstance(
        kps_2d_norm=kps2d,
        kps_3d_cam=kps3d,
        scale=np.asarray(scale, float),
        rotation=r,
        translation=np.asarray(t, float),
    )


def _pred_box(gt: GroundTruthInstance, score=0.9, jitter=0.0):
    rng = np.random.RandomState(0)
    kps3d = gt.kps_3d_cam + rng.randn(*gt.kps_3d_cam.shape) * jitter
    det = {"score": score}
    scale_pred = gt.scale / gt.scale[1]
    return (gt.kps_2d_norm.copy(), kps3d, scale_pred, gt.kps_2d_norm.copy(), det)


class TestEvaluator:
    def test_perfect_prediction_full_ap(self):
        cfg = preset("centerpose", category="shoe")
        ev = Evaluator(cfg, eval_num_symmetry=1)
        gt = _gt()
        ev.evaluate_image([_pred_box(gt)], [gt], plane=None)
        aps = ev.compute_aps()
        assert aps["iou3d"][10] == pytest.approx(1.0)  # IoU@0.5
        assert aps["pixel2d"][-1] == pytest.approx(1.0)
        assert aps["scale"][-1] == pytest.approx(1.0)
        assert aps["add"][-1] == pytest.approx(1.0)

    def test_missing_detection_zero_recall(self):
        cfg = preset("centerpose", category="shoe")
        ev = Evaluator(cfg, eval_num_symmetry=1)
        ev.evaluate_image([], [_gt()], plane=None)
        aps = ev.compute_aps()
        assert aps["iou3d"][10] == 0.0

    def test_plane_scale_recovery(self):
        # Box sitting on the y=-0.5 plane; a half-scaled prediction recovers 2x.
        gt = _gt(scale=(1.0, 1.0, 1.0), t=(0, 0, 0), yaw=0.0)
        plane = (np.array([0.0, -0.5, 0.0]), np.array([0.0, 1.0, 0.0]))
        scale = compute_plane_scale(gt.kps_3d_cam * 0.5, plane)
        assert scale == pytest.approx(2.0, abs=1e-6)

    def test_report_and_consistency(self):
        cfg = preset("centerpose", category="shoe")
        ev = Evaluator(cfg, eval_num_symmetry=1)
        gt = _gt()
        for frame in range(3):
            ev.evaluate_image([_pred_box(gt)], [gt], plane=None, frame_id=frame)
        rep = ev.report()
        assert "iou3d" in rep and "consistency" in rep
        assert ev.consistency_score() == pytest.approx(1.0, abs=1e-5)

    def test_consistency_keyed_per_video(self):
        # Two videos whose per-video frame ids overlap: video A holds a box at
        # one pose, video B the same instance index at a far pose. With
        # per-video keys the cross-video pairs contribute NO IoU terms and the
        # score stays 1.0; a shared key would mix them (score << 1).
        cfg = preset("centerpose", category="shoe")
        ev = Evaluator(cfg, eval_num_symmetry=1)
        gt_a = _gt(t=(0.1, -0.2, 1.5))
        gt_b = _gt(t=(2.5, 1.0, 4.0))
        for frame in range(3):
            ev.evaluate_image([_pred_box(gt_a)], [gt_a], plane=None,
                              frame_id=frame, video_key="vid_a")
            ev.evaluate_image([_pred_box(gt_b)], [gt_b], plane=None,
                              frame_id=frame, video_key="vid_b")
        assert ev.consistency_score() == pytest.approx(1.0, abs=1e-5)

    def test_stats_save_merge(self, tmp_path):
        cfg = preset("centerpose", category="shoe")
        gt = _gt()
        ev1 = Evaluator(cfg, eval_num_symmetry=1)
        ev1.evaluate_image([_pred_box(gt)], [gt])
        p = str(tmp_path / "shard.json")
        ev1.save_stats(p)

        ev2 = Evaluator(cfg, eval_num_symmetry=1)
        ev2.evaluate_image([], [gt])  # one missed GT
        ev2.load_and_merge(p)
        aps = ev2.compute_aps()
        # 1 hit of 2 GT -> recall 0.5 at IoU 0.5.
        assert aps["iou3d"][10] == pytest.approx(0.5)

    def test_parse_gt_json(self, tmp_path):
        ann = {
            "camera_data": {"width": 640, "height": 480},
            "objects": [
                {
                    "projected_cuboid": (np.ones((9, 2)) * 100).tolist(),
                    "keypoints_3d": np.zeros((9, 3)).tolist(),
                    "scale": [0.1, 0.2, 0.3],
                    "quaternion_xyzw": [0, 0, 0, 1],
                    "location": [0, 0, 1],
                }
            ],
            "AR_data": {"plane_center": [0, 0, 0], "plane_normal": [0, 1, 0]},
        }
        p = tmp_path / "a.json"
        with open(p, "w") as f:
            json.dump(ann, f)
        instances, plane, meta = parse_gt_json(str(p))
        assert len(instances) == 1
        np.testing.assert_allclose(
            instances[0].kps_2d_norm[0], [100 / 640, 100 / 480]
        )
        assert plane is not None
        assert meta["width"] == 640

    def test_symmetric_category_sweep_default(self):
        cfg = preset("centerpose", category="bottle")
        ev = Evaluator(cfg)
        assert ev.eval_num_symmetry == 100


def _write_label_dir(tmp_path, cup=(), mug_left=(), mug_right=()):
    """Synthetic reference-layout label dir (label/cup/*.txt)."""
    import os

    d = tmp_path / "label"
    os.makedirs(d / "cup", exist_ok=True)
    for name, entries in (
        ("cup_list.txt", cup),
        ("mug_left_list.txt", mug_left),
        ("mug_right_list.txt", mug_right),
    ):
        with open(d / "cup" / name, "w") as f:
            for video, oid in entries:
                f.write(f"{video}\t{oid}\n")
    return str(d)


class TestCupMugRelabel:
    def test_flags_and_left_mug_swap(self, tmp_path):
        from centerpose_tpu.evaluation.relabel import (
            MIRROR_M,
            SWAP_PAIRS,
            RelabelLists,
        )

        label_dir = _write_label_dir(
            tmp_path,
            cup=[("cup_batch-1_1", "0")],
            mug_left=[("cup_batch-2_2", "0")],
            mug_right=[("cup_batch-3_3", "0")],
        )
        rl = RelabelLists.from_dir(label_dir)

        # cup entry -> not a mug; unknown entries default to mug (parser.py:159-165).
        np.testing.assert_array_equal(
            rl.mug_flags("cup_batch-1_1", 2), [False, True]
        )
        np.testing.assert_array_equal(rl.mug_flags("cup_batch-9_9", 1), [True])

        rng = np.random.RandomState(0)
        p2 = rng.rand(1, 9, 2)
        p3 = rng.rand(1, 9, 3)
        rot = np.tile(np.eye(3), (1, 1, 1))
        p2_orig, p3_orig = p2.copy(), p3.copy()
        flags = rl.apply_mug_relabel("cup_batch-2_2", p2, p3, rot)
        assert flags[0]
        for a, b in SWAP_PAIRS:
            np.testing.assert_allclose(p2[0, a], p2_orig[0, b])
            np.testing.assert_allclose(p2[0, b], p2_orig[0, a])
            np.testing.assert_allclose(p3[0, a], p3_orig[0, b])
        np.testing.assert_allclose(rot[0], np.linalg.inv(MIRROR_M) @ np.eye(3))

        # Right-handled mug: flagged mug, but NOT swapped.
        p2b = rng.rand(1, 9, 2)
        p2b_orig = p2b.copy()
        rl.apply_mug_relabel("cup_batch-3_3", p2b, rng.rand(1, 9, 3), None)
        np.testing.assert_allclose(p2b, p2b_orig)

    def test_route_and_mug_only(self):
        from centerpose_tpu.evaluation.relabel import (
            mug_only_skip,
            route_mug_detector,
        )

        assert route_mug_detector([True, True]) is True
        assert route_mug_detector([False, False]) is False
        assert route_mug_detector([True, False]) is True  # mixed -> mug
        assert route_mug_detector([]) is True

        # mug_only=True skips all-cup; False skips any-mug; None keeps all
        # (eval_image_official.py:336-346).
        assert mug_only_skip([False, False], True)
        assert not mug_only_skip([True, False], True)
        assert mug_only_skip([True, False], False)
        assert not mug_only_skip([False, False], False)
        assert not mug_only_skip([True, True], None)

    def test_mug_symmetry_gate(self):
        """eval_mug_symmetric=False: matched mugs skip the rotation sweep
        (eval_image_official.py:784-787)."""
        cfg = preset("centerpose", category="cup")
        gt = _gt(scale=(0.2, 1.0, 0.8), yaw=0.0)
        gt.mug = True
        # Prediction = the GT box rotated 90° about y: only the symmetry
        # sweep recovers the IoU.
        gt_rot = _gt(scale=(0.2, 1.0, 0.8), yaw=np.pi / 2)
        pred = (gt.kps_2d_norm.copy(), gt_rot.kps_3d_cam, gt.scale / gt.scale[1],
                gt.kps_2d_norm.copy(), {"score": 0.9})

        ev_sweep = Evaluator(cfg, eval_num_symmetry=100, eval_mug_symmetric=True)
        ev_sweep.evaluate_image([pred], [gt], plane=None)
        ev_gate = Evaluator(cfg, eval_num_symmetry=100, eval_mug_symmetric=False)
        ev_gate.evaluate_image([pred], [gt], plane=None)

        assert ev_sweep.compute_aps()["iou3d"][10] == pytest.approx(1.0)
        assert ev_gate.compute_aps()["iou3d"][10] == 0.0

    def test_dual_detector_routing(self, tmp_path):
        """Cup samples run the cup detector, mug samples the mug detector
        (eval_image_official.py:297-304)."""
        import io

        from PIL import Image

        from centerpose_tpu.data.tfrecord import write_tfrecord
        from centerpose_tpu.evaluation.evaluator import evaluate_tfrecords
        from centerpose_tpu.evaluation.relabel import RelabelLists
        from tests.test_tfrecord import make_example

        rng = np.random.RandomState(0)
        img = Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")

        def example(filename):
            pts2d = np.hstack([rng.rand(9, 2), np.ones((9, 1))])
            return make_example(
                {
                    "image/encoded": ("bytes", [buf.getvalue()]),
                    "image/id": ("int64", [0]),
                    "image/filename": ("bytes", [filename.encode()]),
                    "instance_num": ("int64", [1]),
                    "point_num": ("int64", [9]),
                    "point_2d": ("float", pts2d.ravel().tolist()),
                    "point_3d": ("float", rng.rand(9, 3).ravel().tolist()),
                    "object/scale": ("float", [0.1, 0.2, 0.15]),
                    "object/translation": ("float", [0, 0, 1.0]),
                    "object/orientation": ("float", np.eye(3).ravel().tolist()),
                    "object/visibility": ("float", [1.0]),
                }
            )

        rec = str(tmp_path / "cup.tfrecord")
        write_tfrecord(
            rec, [example("cup/batch-1/1"), example("cup/batch-2/2")]
        )
        label_dir = _write_label_dir(tmp_path, cup=[("cup_batch-1_1", "0")])

        class StubDetector:
            def __init__(self):
                self.calls = 0

            def run(self, img, meta=None):
                self.calls += 1
                return {"boxes": []}

            def reset_tracking(self):
                pass

        cup_det, mug_det = StubDetector(), StubDetector()
        cfg = preset("centerpose", category="cup", input_h=64, input_w=64)
        ev = evaluate_tfrecords(
            cup_det, [rec], cfg,
            detector_mug=mug_det,
            relabel=RelabelLists.from_dir(label_dir),
        )
        assert cup_det.calls == 1 and mug_det.calls == 1
        assert ev.num_gt == 2

        # mug_only filtering: cup-only keeps 1 sample on the cup detector.
        cup_det2, mug_det2 = StubDetector(), StubDetector()
        ev2 = evaluate_tfrecords(
            cup_det2, [rec], cfg,
            detector_mug=mug_det2,
            relabel=RelabelLists.from_dir(label_dir),
            mug_only=False,
        )
        assert cup_det2.calls == 1 and mug_det2.calls == 0
        assert ev2.num_gt == 1


class TestTfrecordEval:
    def test_evaluate_tfrecords_end_to_end(self, tmp_path):
        """Toy Objectron tfrecord -> detector -> AP accumulation."""
        import io

        from PIL import Image

        from centerpose_tpu.data.tfrecord import write_tfrecord
        from centerpose_tpu.evaluation.evaluator import evaluate_tfrecords
        from centerpose_tpu.inference.detector import Detector
        from tests.test_tfrecord import make_example

        rng = np.random.RandomState(0)
        img = Image.fromarray((rng.rand(96, 128, 3) * 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")

        pts2d = np.hstack([rng.rand(9, 2), np.ones((9, 1))])
        payload = make_example(
            {
                "image/encoded": ("bytes", [buf.getvalue()]),
                "image/id": ("int64", [0]),
                "image/filename": ("bytes", [b"shoe/batch-1/2/frame"]),
                "instance_num": ("int64", [1]),
                "point_num": ("int64", [9]),
                "point_2d": ("float", pts2d.ravel().tolist()),
                "point_3d": ("float", rng.rand(9, 3).ravel().tolist()),
                "object/scale": ("float", [0.1, 0.2, 0.15]),
                "object/translation": ("float", [0, 0, 1.0]),
                "object/orientation": ("float", np.eye(3).ravel().tolist()),
                "object/visibility": ("float", [1.0]),
                "camera/intrinsics": (
                    "float", np.array([[120, 0, 48], [0, 120, 64], [0, 0, 1.0]]).ravel().tolist(),
                ),
                "plane/center": ("float", [0, -0.1, 1]),
                "plane/normal": ("float", [0, 1, 0]),
            }
        )
        rec = str(tmp_path / "video.tfrecord")
        write_tfrecord(rec, [payload])

        cfg = preset("centerpose", input_h=64, input_w=64, K=8, vis_thresh=0.0)
        detector = Detector(cfg)
        ev = evaluate_tfrecords(detector, [rec], cfg, is_video=False)
        assert ev.num_gt == 1
        assert "iou3d" in ev.report()
