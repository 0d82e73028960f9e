"""Hit/Miss accumulation and confidence-ranked average precision.

Parity targets:
  * `HitMiss` over 21 linspace thresholds per metric family
    (src/tools/objectron_eval/eval_image_official.py:59-64,145-160);
  * confidence-ranked AP (`metrics_nvidia.py:32-137`): hit/miss pairs recorded with
    their confidence, sorted descending, cumulative precision/recall, VOC-style
    all-points interpolation (precision envelope, sum over recall steps);
  * viewpoint (azimuth/polar), ADD/ADD-S, scale and 2D-pixel error definitions
    (eval_image_official.py:664-994).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

DEFAULT_NUM_BINS = 21

# Metric-family threshold ranges (eval_image_official.py:59-64).
THRESH_3D_IOU = np.linspace(0.0, 1.0, DEFAULT_NUM_BINS)
THRESH_2D_PIXEL = np.linspace(0.0, 0.1, DEFAULT_NUM_BINS)
THRESH_AZIMUTH = np.linspace(0.0, 30.0, DEFAULT_NUM_BINS)
THRESH_POLAR = np.linspace(0.0, 20.0, DEFAULT_NUM_BINS)
THRESH_ADD = np.linspace(0.0, 1.0, DEFAULT_NUM_BINS)
THRESH_SCALE = np.linspace(0.0, 1.0, DEFAULT_NUM_BINS)


class HitMiss:
    """Per-threshold (hit, confidence) records for one metric family.

    `record_hit_miss(metric, conf)`: for error-type metrics, pass
    `greater=False` so a hit is metric <= threshold; for IoU-type, hit is
    metric >= threshold.
    """

    def __init__(self, thresholds: np.ndarray):
        self.thresholds = np.asarray(thresholds, np.float64)
        self.records: List[List[Tuple[float, float]]] = [
            [] for _ in self.thresholds
        ]

    def record_hit_miss(self, metric: float, conf: float = 1.0, greater: bool = True):
        for i, t in enumerate(self.thresholds):
            hit = metric >= t if greater else metric <= t
            self.records[i].append((1.0 if hit else 0.0, float(conf)))


class AveragePrecision:
    """Confidence-ranked AP accumulation over a HitMiss family
    (metrics_nvidia.py semantics)."""

    def __init__(self, num_gt: int = 0):
        self.num_gt = num_gt
        self.aps: Optional[np.ndarray] = None

    @staticmethod
    def _ap_from_records(
        records: Sequence[Tuple[float, float]], num_gt: int
    ) -> float:
        if not records or num_gt <= 0:
            return 0.0
        arr = np.asarray(records, np.float64)
        order = np.argsort(-arr[:, 1], kind="stable")
        hits = arr[order, 0]
        tp = np.cumsum(hits)
        fp = np.cumsum(1.0 - hits)
        recall = tp / num_gt
        precision = tp / np.maximum(tp + fp, 1e-12)

        # VOC all-points interpolation: precision envelope integrated over recall.
        mrec = np.concatenate([[0.0], recall, [recall[-1]]])
        mpre = np.concatenate([[0.0], precision, [0.0]])
        for i in range(len(mpre) - 2, -1, -1):
            mpre[i] = max(mpre[i], mpre[i + 1])
        idx = np.where(mrec[1:] != mrec[:-1])[0]
        return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))

    def compute(self, hitmiss: HitMiss) -> np.ndarray:
        self.aps = np.array(
            [self._ap_from_records(r, self.num_gt) for r in hitmiss.records]
        )
        return self.aps

    def at_threshold(self, hitmiss: HitMiss, thresh_value: float) -> float:
        aps = self.compute(hitmiss)
        i = int(np.argmin(np.abs(hitmiss.thresholds - thresh_value)))
        return float(aps[i])


# ------------------------------------------------------------------ metric defs
def scale_error(scale_pred, scale_gt) -> float:
    """Relative scale error after height normalization
    (eval_image_official.py:664-671): mean |Δs| / s_gt over the 3 dims with both
    scales normalized by their y component."""
    p = np.asarray(scale_pred, np.float64)
    g = np.asarray(scale_gt, np.float64)
    p = p / p[1]
    g = g / g[1]
    return float(np.mean(np.abs(p - g) / g))


def pixel_error_2d(
    kps_pred: np.ndarray, kps_gt: np.ndarray, num_symmetry: int = 1
) -> float:
    """Mean normalized 2D keypoint distance with a symmetry sweep over GT corner
    relabelings (eval_image_official.py:673-719). Both inputs are [9, 2] normalized
    (center first, corners in binary order)."""
    pred = np.asarray(kps_pred, np.float64)
    gt = np.asarray(kps_gt, np.float64)
    if num_symmetry <= 1:
        return float(np.mean(np.linalg.norm(pred - gt, axis=1)))
    # Rotating about local y permutes corners within top/bottom rings; sweep by
    # rotating the GT corner ids through the 4-cycles (1,5,7,3) and (2,6,8,4)
    # in 9-pt indexing (bottom ring and top ring).
    best = np.inf
    bottom = [1, 5, 7, 3]  # y = -, cycling around y axis
    top = [2, 6, 8, 4]
    from itertools import chain

    for k in range(4):
        perm = np.arange(9)
        for src, dst in zip(bottom, np.roll(bottom, -k)):
            perm[src] = dst
        for src, dst in zip(top, np.roll(top, -k)):
            perm[src] = dst
        err = float(np.mean(np.linalg.norm(pred - gt[perm], axis=1)))
        best = min(best, err)
    return best


def viewpoint_angles(rotation: np.ndarray) -> Tuple[float, float]:
    """(azimuth, polar) of the camera in the object frame, degrees
    (eval_image_official.py:949-994 definition: direction from object to camera
    expressed in object coordinates)."""
    r = np.asarray(rotation, np.float64)
    # Camera forward (0,0,0) seen from the object: -R^T t direction; with unit
    # convention we take the object-frame z of the camera center direction.
    cam_dir = -r.T @ np.array([0.0, 0.0, 1.0])
    azimuth = np.degrees(np.arctan2(cam_dir[0], cam_dir[2])) % 360.0
    polar = np.degrees(np.arccos(np.clip(cam_dir[1], -1.0, 1.0)))
    return float(azimuth), float(polar)


def azimuth_polar_error(
    rot_pred: np.ndarray, rot_gt: np.ndarray, num_symmetry: int = 1
) -> Tuple[float, float]:
    """Angular viewpoint errors with optional symmetry sweep."""
    az_g, po_g = viewpoint_angles(rot_gt)
    best_az, best_po = np.inf, np.inf
    n = max(1, num_symmetry)
    for i in range(n):
        theta = 2.0 * np.pi * i / n
        c, s = np.cos(theta), np.sin(theta)
        ry = np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
        az_p, po_p = viewpoint_angles(np.asarray(rot_pred) @ ry)
        d_az = abs(az_p - az_g)
        d_az = min(d_az, 360.0 - d_az)
        best_az = min(best_az, d_az)
        best_po = min(best_po, abs(po_p - po_g))
    return float(best_az), float(best_po)


def add_metric(points_pred: np.ndarray, points_gt: np.ndarray) -> float:
    """ADD: mean 3D distance between corresponding points (meters)."""
    return float(
        np.mean(np.linalg.norm(np.asarray(points_pred) - np.asarray(points_gt), axis=1))
    )


def adds_metric(points_pred: np.ndarray, points_gt: np.ndarray) -> float:
    """ADD-S: mean closest-point 3D distance (symmetric objects)."""
    p = np.asarray(points_pred, np.float64)
    g = np.asarray(points_gt, np.float64)
    d = np.linalg.norm(p[:, None, :] - g[None, :, :], axis=2)
    return float(np.mean(d.min(axis=1)))
