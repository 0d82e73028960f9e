#!/usr/bin/env python
"""Offline preprocessor: Objectron video + annotation .pbdata → png+json pairs.

Parity target: data/preprocess.py (ffmpeg rawvideo frame extraction at a chosen
frame rate, ×resolution_ratio downsize, DOPE/NDDS-style json export per frame via
data/utils.py export_to_ndds_file). The annotation protobufs are decoded by the
dependency-free parser in centerpose_tpu/data/objectron_pb.py; frame decoding uses
ffmpeg when present, or a directory of pre-extracted frames.
"""

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", required=True,
                   help="video file (needs ffmpeg) or directory of frames")
    p.add_argument("--annotation", required=True, help="Sequence .pbdata file")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--frame_rate", type=int, default=15,
                   help="15 for CenterPose, 1 for Track (data/README.md:19)")
    p.add_argument("--resolution_ratio", type=float, default=2.4)
    args = p.parse_args()

    import numpy as np
    from PIL import Image

    from centerpose_tpu.data.objectron_pb import frame_to_ndds_dict, parse_sequence
    from centerpose_tpu.data.video import open_video

    with open(args.annotation, "rb") as f:
        seq = parse_sequence(f.read())
    n_frames = len(seq["frame_annotations"])
    print(f"annotation: {n_frames} frames, {len(seq['objects'])} objects")

    os.makedirs(args.out_dir, exist_ok=True)
    reader = open_video(args.video, fps=args.frame_rate)

    written = 0
    for idx, frame in enumerate(reader):
        if idx >= n_frames:
            break
        record = frame_to_ndds_dict(seq, idx, args.resolution_ratio)
        w = record["camera_data"]["width"]
        h = record["camera_data"]["height"]
        img = Image.fromarray(np.asarray(frame, np.uint8)).resize((w, h))
        img.save(os.path.join(args.out_dir, f"{idx:05d}.png"))
        with open(os.path.join(args.out_dir, f"{idx:05d}.json"), "w") as f:
            json.dump(record, f)
        written += 1
    print(f"wrote {written} frame pairs to {args.out_dir}")


if __name__ == "__main__":
    main()
