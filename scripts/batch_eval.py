#!/usr/bin/env python
"""Batch evaluation driver — sweep categories × eval modes.

Parity target: the reference's shell drivers (src/tools/objectron_eval/
shell_eval_image_CenterPose.py, shell_eval_video_CenterPose.py,
shell_eval_video_CenterPoseTrack.py:8-87): subprocess sweeps over the 9 categories
and predefined ablation modes; symmetric categories get --eval_num_symmetry 100.

All 9 reference modes (shell_eval_video_CenterPoseTrack.py:24-52):
  0 dlav1_34 image model (baseline)
  1 dlav1_34 + refined Kalman + GT first-frame seed
  2 dla_34 tracking: Kalman + scale pool + previous heatmaps
  3 mode 2 + GT first-frame seed
  4 mode 3 + noise on the seeded GT keypoints
  5 mode 3 with CenterPose-initialization seeding (an image model's
    detections seed the tracker instead of GT)
  6 tracking + GT seed WITHOUT Kalman/scale pool
  7 tracking + GT seed WITHOUT previous heatmaps (rendered empty here —
    the stems receive zeros either way)
  8 mode 3 with emptied previous heatmaps (tracking null test)
"""

import argparse
import os
import subprocess
import sys

CATEGORIES = (
    "bike", "book", "bottle", "camera", "cereal_box", "chair", "cup", "laptop",
    "shoe",
)
SYMMETRIC = ("bottle", "cup")

_TRACK = ["--tracking", "--arch", "dla_34"]
MODES = {
    0: ["--arch", "dlav1_34"],
    1: ["--arch", "dlav1_34", "--refined_kalman", "--eval_gt_pre_hm_first"],
    2: _TRACK,
    3: _TRACK + ["--eval_gt_pre_hm_first"],
    4: _TRACK + ["--eval_gt_pre_hm_first", "--eval_add_noise"],
    5: _TRACK + ["--eval_gt_pre_hm_first", "--eval_CenterPose_initialization"],
    6: _TRACK + ["--eval_gt_pre_hm_first", "--no_kalman", "--no_scale_pool"],
    7: _TRACK + ["--eval_gt_pre_hm_first", "--eval_empty_pre_hm"],
    8: _TRACK + ["--eval_gt_pre_hm_first", "--eval_empty_pre_hm"],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True, help="root containing <category>/ dirs")
    p.add_argument("--model_root", default="", help="root containing <category> checkpoints")
    p.add_argument("--categories", nargs="*", default=list(CATEGORIES))
    p.add_argument("--modes", nargs="*", type=int, default=[0])
    p.add_argument("--tracking", action="store_true")
    p.add_argument("--report_dir", default="reports")
    p.add_argument("--max_images", type=int, default=0)
    p.add_argument("--eval_continue", action="store_true",
                   help="skip category/mode combos whose report file already exists "
                        "(--eval_continue parity, eval_video_official.py:1599-1602)")
    args = p.parse_args()

    os.makedirs(args.report_dir, exist_ok=True)
    for cat in args.categories:
        for mode in args.modes:
            report = os.path.join(args.report_dir, f"{cat}_mode{mode}.txt")
            if args.eval_continue and os.path.exists(report):
                print("SKIP (exists)", report)
                continue
            cmd = [
                sys.executable, "evaluate.py",
                "--mode", "metric",
                "--data_dir", os.path.join(args.data_root, cat),
                "--c", cat,
                "--report_file", report,
            ]
            if args.model_root:
                cmd += ["--load_model", os.path.join(args.model_root, cat)]
            if args.tracking:
                cmd += ["--tracking"]
            if cat in SYMMETRIC:
                cmd += ["--eval_num_symmetry", "100"]
            if args.max_images:
                cmd += ["--max_images", str(args.max_images)]
            cmd += MODES.get(mode, [])
            print("RUN", " ".join(cmd))
            subprocess.run(cmd, check=False)


if __name__ == "__main__":
    main()
