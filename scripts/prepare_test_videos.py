#!/usr/bin/env python
"""Re-sort shuffled Objectron TFRecords into per-video record files.

Parity target: src/tools/objectron_eval/prepare_test_video.py — the video
evaluator needs frames grouped per video in temporal order; the public
records_shuffled shards interleave videos. The video id is the prefix of
`image/filename` (`<category>/batch-N/M/...`); frames sort by `image/id`.
"""

import argparse
import glob
import os
from collections import defaultdict


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--records", required=True, help="shuffled tfrecord file or glob")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--max_videos", type=int, default=0)
    args = p.parse_args()

    from centerpose_tpu.data.tfrecord import (
        parse_objectron_example,
        read_tfrecord,
        write_tfrecord,
    )

    paths = sorted(glob.glob(args.records)) if any(
        ch in args.records for ch in "*?["
    ) else [args.records]

    by_video = defaultdict(list)  # video id -> [(frame_id, payload)]
    for path in paths:
        for payload in read_tfrecord(path):
            ex = parse_objectron_example(payload)
            name = ex.get("filename", "")
            video = "_".join(name.split("/")[:3]) if name else "unknown"
            by_video[video].append((ex.get("image_id", 0), payload))

    os.makedirs(args.out_dir, exist_ok=True)
    videos = sorted(by_video)
    if args.max_videos:
        videos = videos[: args.max_videos]
    for video in videos:
        frames = sorted(by_video[video], key=lambda t: t[0])
        out = os.path.join(args.out_dir, f"{video}.tfrecord")
        write_tfrecord(out, [p for _, p in frames])
        print(f"{out}: {len(frames)} frames")


if __name__ == "__main__":
    main()
