"""CenterPose + Kalman baseline tracker (the `--refined_Kalman` mode).

Parity target: `Tracker_baseline` (src/lib/utils/tracker_baseline.py:14-310). Same
skeleton as the full tracker with three behavioral differences:
  * the Kalman filter observes positions only (dim_z=16, :55-77) — velocities are
    latent, never measured (there is no tracking_hp head in plain CenterPose);
  * association predicts each track's center with its mean KF velocity instead of
    using the detection's tracking offset (:134-140);
  * the scale pool is a plain running mean rather than inverse-variance fusion
    (:91-100).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from centerpose_tpu.config import CenterPoseConfig
from centerpose_tpu.tracking.kalman import KeypointKalman
from centerpose_tpu.tracking.tracker import Tracker


class TrackerBaseline(Tracker):
    def step(self, dets: List[dict], boxes: List[tuple], meta: Optional[dict] = None):
        # Shift each track's center by its mean KF velocity before association,
        # then run the shared association/update skeleton.
        for track in self.tracks:
            if "kf" in track:
                v = track["kf"].mean_velocity
                ct = np.asarray(track["ct"], np.float64)
                track["ct"] = (ct + v).tolist()
        # Detections carry no tracking offset in plain CenterPose.
        for det in dets:
            det.setdefault("tracking", np.zeros(2))
            det.setdefault("tracking_hp", np.zeros(16))
        return super().step(dets, boxes, meta)

    # --- overrides of the KF interaction points --------------------------------
    def _kf_init(self, det: dict) -> KeypointKalman:
        kf = KeypointKalman.init(
            np.asarray(det["kps_fusion_mean"]),
            np.asarray(det["kps_fusion_std"]),
            np.zeros(16),
            self.cfg.kf_r_velocity,
        )
        return kf

    def _kf_update(self, kf: KeypointKalman, det: dict) -> None:
        kf.update_positions(
            np.asarray(det["kps_fusion_mean"]), np.asarray(det["kps_fusion_std"])
        )

    def _pool(self, scale_pool):
        # Plain mean (tracker_baseline.py:91-100).
        means = np.stack([np.asarray(m, np.float64) for m, _ in scale_pool])
        stds = np.stack([np.asarray(s, np.float64) for _, s in scale_pool])
        return means.mean(axis=0), stds.mean(axis=0)
