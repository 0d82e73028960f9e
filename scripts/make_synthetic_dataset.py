#!/usr/bin/env python
"""Generate a synthetic DOPE-format dataset with exact ground truth.

The emitted png+json tree is directly consumable by train.py (--data_dir) and
evaluate.py --mode metric (--data_dir), closing the framework's accuracy loop
(train → checkpoint → detector → Objectron-style AP) without the real
Objectron dataset. See centerpose_tpu/data/synthetic.py for the conventions.

Example (the ACCURACY_r04 protocol):
    python scripts/make_synthetic_dataset.py --out data/synth_train \
        --n_videos 24 --frames 16 --seed 0
    python scripts/make_synthetic_dataset.py --out data/synth_val \
        --n_videos 6 --frames 8 --seed 777
"""

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--n_videos", type=int, default=10)
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--height", type=int, default=480)
    p.add_argument(
        "--video_motion", action="store_true",
        help="fixed scene per video with a smoothly orbiting camera "
             "(tracking/consistency eval); default: independent frames",
    )
    args = p.parse_args()

    from centerpose_tpu.data.synthetic import generate_dataset

    paths = generate_dataset(
        args.out, n_videos=args.n_videos, frames_per_video=args.frames,
        seed=args.seed, width=args.width, height=args.height,
        video_motion=args.video_motion,
    )
    print(f"wrote {len(paths)} frames under {args.out}")


if __name__ == "__main__":
    main()
