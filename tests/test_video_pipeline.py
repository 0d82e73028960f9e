"""CenterPoseTrack end-to-end video pipeline on tiny inputs."""

import numpy as np
import pytest

from centerpose_tpu.config import preset
from centerpose_tpu.inference.detector import Detector


class TestTrackingPipeline:
    @pytest.fixture(scope="class")
    def detector(self):
        cfg = preset(
            "centerpose_track", input_h=64, input_w=64, K=8, category="shoe",
            vis_thresh=0.0,
        )
        return Detector(cfg)

    def test_multi_frame_run(self, detector):
        rng = np.random.RandomState(0)
        frames = [(rng.rand(96, 128, 3) * 255).astype(np.uint8) for _ in range(3)]
        detector.reset_tracking()
        outs = [detector.run(f) for f in frames]
        for out in outs:
            assert "track" in out["times"]
        # pre_images carried between frames
        assert detector.pre_images is not None

    def test_reset_tracking(self, detector):
        detector.reset_tracking()
        assert detector.pre_images is None
        assert detector.tracker.tracks == []

    def test_track_ids_persist_across_frames(self, detector):
        # With an untrained network, detections are noise — only verify the
        # machinery: ids increase monotonically and state updates don't crash.
        rng = np.random.RandomState(1)
        detector.reset_tracking()
        for _ in range(2):
            out = detector.run((rng.rand(96, 128, 3) * 255).astype(np.uint8))
        ids = [t.get("tracking_id") for t in detector.tracker.tracks]
        assert all(isinstance(i, (int, np.integer)) for i in ids)
