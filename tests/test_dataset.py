import json
import os

import numpy as np
import pytest

from centerpose_tpu.config import preset
from centerpose_tpu.data.dataset import (
    ObjectPoseDataset,
    collate_filtered,
    find_samples,
    rotation_y_matrix,
)


@pytest.fixture
def toy_dataset(tmp_path):
    """Write two DOPE-style png+json frames (one video dir)."""
    from PIL import Image

    vid = tmp_path / "video_0"
    vid.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(vid / f"{i:05d}.png")
        kps = np.array(
            [[320, 240]]
            + [[320 + dx, 240 + dy] for dx in (-60, 60) for dy in (-40, 40)
               for _ in (0,)][:8]
        )
        kps9 = np.vstack(
            [[320, 240]] + [[320 + dx * 60, 240 + dy * 40] for dx in (-1, 1)
                            for dy in (-1, 1)] * 2
        )[:9]
        ann = {
            "camera_data": {
                "width": 640,
                "height": 480,
                "camera_projection_matrix": np.eye(4).tolist(),
                "intrinsics": {"fx": 600.0, "fy": 600.0, "cx": 320.0, "cy": 240.0},
            },
            "objects": [
                {
                    "name": "shoe_0",
                    "location": [0.0, 0.0, 1.0],
                    "quaternion_xyzw": [0.0, 0.0, 0.0, 1.0],
                    "projected_cuboid": kps9.tolist(),
                    "scale": [0.1, 0.1, 0.25],
                    "keypoints_3d": (np.random.RandomState(1).rand(9, 3)).tolist(),
                }
            ],
        }
        with open(vid / f"{i:05d}.json", "w") as f:
            json.dump(ann, f)
    return str(tmp_path)


class TestDiscovery:
    def test_find_samples(self, toy_dataset):
        samples = find_samples(toy_dataset)
        assert len(samples) == 2
        assert samples[0][1] == "video_0"
        assert samples[0][2] == 0 and samples[1][2] == 1

    def test_missing_json_skipped(self, tmp_path):
        from PIL import Image

        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(tmp_path / "a.png")
        assert find_samples(str(tmp_path)) == []


class TestDataset:
    def test_getitem_structure(self, toy_dataset):
        cfg = preset("centerpose", input_h=64, input_w=64, category="shoe")
        ds = ObjectPoseDataset(toy_dataset, cfg, split="val")
        item = ds[0]
        assert item is not None
        assert item["input"].shape == (64, 64, 3)
        assert item["hm"].shape == (1, 16, 16, 1)  # [S, H, W, C]
        assert item["ind"].shape == (1, cfg.max_objs)
        # The object is centered -> a center gaussian must exist.
        assert item["hm"].max() == pytest.approx(1.0)
        assert item["reg_mask"].sum() >= 1

    def test_train_augmentation_changes_sample(self, toy_dataset):
        cfg = preset("centerpose", input_h=64, input_w=64)
        ds = ObjectPoseDataset(toy_dataset, cfg, split="train", seed=7)
        a = ds[0]
        b = ds[0]  # new random aug draw
        assert a is not None and b is not None
        assert not np.allclose(a["input"], b["input"])

    def test_symmetry_axis_present(self, toy_dataset):
        cfg = preset("centerpose", input_h=64, input_w=64, category="bottle",
                     num_symmetry=12)
        ds = ObjectPoseDataset(toy_dataset, cfg, split="val")
        item = ds[0]
        assert item is not None
        assert item["hm"].shape[0] == 12

    def test_video_grouping(self, toy_dataset):
        cfg = preset("centerpose", input_h=64, input_w=64)
        ds = ObjectPoseDataset(toy_dataset, cfg)
        assert list(ds.videos) == ["video_0"]
        assert len(ds.videos["video_0"]) == 2

    def test_collate_filters_none(self):
        a = {"x": np.ones(2)}
        out = collate_filtered([a, None, a])
        assert out["x"].shape == (2, 2)
        assert collate_filtered([None, None]) is None

    def test_rotation_y_matrix(self):
        m = rotation_y_matrix(np.pi / 2)
        v = m[:3, :3] @ np.array([1.0, 0.0, 0.0])
        np.testing.assert_allclose(v, [0, 0, -1], atol=1e-12)


class TestTrackingDataset:
    def test_tracking_sample_structure(self, toy_dataset):
        from centerpose_tpu.config import preset

        cfg = preset("centerpose_track", input_h=64, input_w=64, category="shoe")
        ds = ObjectPoseDataset(toy_dataset, cfg, split="train", seed=5)
        item = None
        for _ in range(5):  # lost_disturb may drop; retry a few draws
            item = ds[0]
            if item is not None and item["pre_hm"].max() > 0:
                break
        assert item is not None
        assert item["pre_img"].shape == (64, 64, 3)
        assert item["pre_hm"].shape == (64, 64, 1)
        assert item["pre_hm_hp"].shape == (64, 64, 8)
        assert "tracking" in item and item["tracking"].shape == (1, cfg.max_objs, 2)
        assert "tracking_hp" in item

    def test_tracking_offsets_small_for_static_video(self, toy_dataset):
        from centerpose_tpu.config import preset

        cfg = preset("centerpose_track", input_h=64, input_w=64, category="shoe")
        ds = ObjectPoseDataset(
            toy_dataset, cfg, split="val", hm_disturb=0.0, lost_disturb=0.0,
            fp_disturb=0.0, hp_lost_disturb=0.0,
        )
        item = ds[0]
        assert item is not None
        tm = item["tracking_mask"][0]
        if tm.sum() > 0:
            # Same-content frames, no aug in val -> offsets bounded by the
            # int-rounding of centers (< 2 px at output res).
            t = np.abs(item["tracking"][0][tm > 0])
            assert t.max() < 2.5

    def test_tracking_hp_mask_requires_prev_keypoint(self, toy_dataset):
        # tracking_hp supervision requires the PREV keypoint to exist
        # (dataset_combined.py:1115-1118 masks with pts_mask_pre); with
        # hp_lost_disturb=1 every prev keypoint is dropped from pre_hm_hp,
        # so the mask must be all-zero even though the current kps are
        # visible — training a zero offset there would be wrong supervision.
        cfg = preset("centerpose_track", input_h=64, input_w=64, category="shoe")
        ds = ObjectPoseDataset(
            toy_dataset, cfg, split="val", hm_disturb=0.0, lost_disturb=0.0,
            fp_disturb=0.0, hp_lost_disturb=1.0,
        )
        item = ds[0]
        assert item is not None
        assert item["tracking_hp_mask"].sum() == 0
        # And with no disturbs at all, prev keypoints exist -> mask set and
        # offsets near zero for the static toy video.
        ds2 = ObjectPoseDataset(
            toy_dataset, cfg, split="val", hm_disturb=0.0, lost_disturb=0.0,
            fp_disturb=0.0, hp_lost_disturb=0.0,
        )
        item2 = ds2[0]
        assert item2 is not None
        m = item2["tracking_hp_mask"][0]
        if m.sum() > 0:
            assert np.abs(item2["tracking_hp"][0][m > 0]).max() < 2.5

    def test_filtered_annotation_does_not_shift_tracking_pairing(self, toy_dataset):
        # A skipped annotation (no 'scale') must not shift which object the
        # tracking targets attach to (the objects list pairs with kept anns).
        import json as _json

        vid = os.path.join(toy_dataset, "video_0")
        for i in range(2):
            p = os.path.join(vid, f"{i:05d}.json")
            with open(p) as f:
                ann = _json.load(f)
            bad = dict(ann["objects"][0])
            bad.pop("scale")
            bad["name"] = "shoe_bad"
            # Distinct cuboid so a mis-pairing would produce big offsets.
            bad["projected_cuboid"] = (
                np.asarray(ann["objects"][0]["projected_cuboid"]) + 150.0
            ).tolist()
            ann["objects"] = [bad, ann["objects"][0]]
            with open(p, "w") as f:
                _json.dump(ann, f)
        cfg = preset("centerpose_track", input_h=64, input_w=64, category="shoe")
        ds = ObjectPoseDataset(
            toy_dataset, cfg, split="val", hm_disturb=0.0, lost_disturb=0.0,
            fp_disturb=0.0, hp_lost_disturb=0.0,
        )
        item = ds[0]
        assert item is not None
        tm = item["tracking_mask"][0]
        assert tm.sum() > 0  # the good object still gets its target
        assert np.abs(item["tracking"][0][tm > 0]).max() < 2.5

    def test_detector_in_loop_generation(self, toy_dataset):
        """data_generation_mode 1: previous heatmaps from a detector's outputs."""
        from centerpose_tpu.config import preset
        from centerpose_tpu.inference.detector import Detector

        cfg_det = preset("centerpose", input_h=64, input_w=64, K=8, vis_thresh=0.0)
        det = Detector(cfg_det)
        cfg = preset("centerpose_track", input_h=64, input_w=64, category="shoe")
        ds = ObjectPoseDataset(
            toy_dataset, cfg, split="val", detector=det,
            data_generation_mode_ratio=1.0,
        )
        item = ds[0]
        assert item is not None
        assert item["pre_hm"].shape == (64, 64, 1)
        # Untrained detector still produces detections at vis_thresh 0 -> some heat.
        assert item["pre_hm"].max() >= 0.0


class TestNewDataAugmentation:
    """--new_data_augmentation (dataset_combined.py:307-318), native mirror."""

    def test_motion_blur_preserves_mean_and_shape(self):
        from centerpose_tpu.data.dataset import _motion_blur

        rng = np.random.RandomState(3)
        img = rng.rand(40, 50, 3).astype(np.float32) * 255.0
        out = _motion_blur(rng, img)
        assert out.shape == img.shape
        # The kernel is normalized to sum 1 -> global mean is ~preserved
        # (mirror border is mean-neutral on random content).
        assert abs(out.mean() - img.mean()) < 2.0
        # 3x3 kernel with >=2 taps strictly smooths iid noise.
        assert out.std() < img.std()

    def test_motion_blur_identity_on_constant(self):
        from centerpose_tpu.data.dataset import _motion_blur

        img = np.full((16, 16, 3), 127.0, np.float32)
        out = _motion_blur(np.random.RandomState(0), img)
        np.testing.assert_allclose(out, img, atol=1e-4)

    def test_downscale_duplicates_pixels(self):
        from centerpose_tpu.data.dataset import _downscale

        rng = np.random.RandomState(5)
        img = rng.rand(64, 64, 3).astype(np.float32) * 255.0
        out = _downscale(rng, img)
        assert out.shape == img.shape
        # Nearest down(0.6..0.8)+up leaves only the sub-sampled value set.
        assert len(np.unique(out)) < len(np.unique(img))
        assert set(np.unique(out)).issubset(set(np.unique(img)))

    def test_gauss_noise_stats_and_clipping(self):
        from centerpose_tpu.data.dataset import _gauss_noise

        rng = np.random.RandomState(7)
        img = np.full((64, 64, 3), 128.0, np.float32)
        out = _gauss_noise(rng, img)
        # var in [10, 50] -> sigma in [3.2, 7.1]
        assert 2.5 < out.std() < 8.0
        assert out.min() >= 0.0 and out.max() <= 255.0
        out2 = _gauss_noise(np.random.RandomState(8), np.zeros((8, 8, 3)))
        assert out2.min() >= 0.0

    def test_compose_probability_gating(self):
        from centerpose_tpu.data.dataset import new_data_augment

        img = (np.random.RandomState(1).rand(32, 32, 3) * 255).astype(np.float32)
        rng = np.random.RandomState(0)
        changed = sum(
            float(not np.array_equal(new_data_augment(rng, img), img))
            for _ in range(200)
        )
        # P(any op fires) = 1 - 0.9*0.9*0.8 = 0.352; [40, 100] of 200 is a
        # >6-sigma acceptance band either side.
        assert 40 <= changed <= 100

    def test_dataset_wiring_train_only(self, toy_dataset):
        cfg = preset("centerpose", input_h=64, input_w=64)
        ds_val = ObjectPoseDataset(toy_dataset, cfg, split="val", new_data_aug=True)
        assert not ds_val.new_data_aug
        ds = ObjectPoseDataset(toy_dataset, cfg, split="train", new_data_aug=True)
        assert ds.new_data_aug
        item = ds[0]
        assert item is not None and np.isfinite(item["input"]).all()
