#!/usr/bin/env python
"""Offline preprocessor: Objectron TFRecords → DOPE-style png+json training pairs.

Parity target: the reference's offline pipeline (data/preprocess.py +
data/utils.py export_to_ndds_file) produces per-frame `XXXXX.png` + `XXXXX.json`
pairs that ObjectPoseDataset consumes. The reference decodes the raw Objectron
videos + Sequence protobufs; this preprocessor instead consumes the public
records_shuffled / per-video TFRecords through the native reader
(centerpose_tpu/data/tfrecord.py), which carry the same annotations.

Downloading the records requires network access (gs://objectron/v1/...); in
zero-egress environments point --records at pre-fetched files.
"""

import argparse
import glob
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--records", required=True, help="tfrecord file or glob")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--category", default="shoe")
    p.add_argument("--max_frames", type=int, default=0)
    args = p.parse_args()

    import io

    import numpy as np
    from PIL import Image

    from centerpose_tpu.data.tfrecord import parse_objectron_example, read_tfrecord

    paths = sorted(glob.glob(args.records)) if any(
        ch in args.records for ch in "*?["
    ) else [args.records]

    count = 0
    for rpath in paths:
        vid = os.path.splitext(os.path.basename(rpath))[0]
        out_dir = os.path.join(args.out_dir, args.category, vid)
        os.makedirs(out_dir, exist_ok=True)
        for payload in read_tfrecord(rpath):
            if args.max_frames and count >= args.max_frames:
                return
            ex = parse_objectron_example(payload)
            if "image_bytes" not in ex or ex.get("num_instances", 0) == 0:
                continue
            img = Image.open(io.BytesIO(ex["image_bytes"])).convert("RGB")
            w, h = img.size

            from scipy.spatial.transform import Rotation as R

            objects = []
            for i in range(ex["num_instances"]):
                kps2d = np.asarray(ex["points_2d"][i])[:9].copy()
                kps2d[:, 0] *= w
                kps2d[:, 1] *= h
                quat = R.from_matrix(ex["rotations"][i]).as_quat()
                objects.append(
                    {
                        "name": f"{args.category}_{i}",
                        "location": np.asarray(ex["translations"][i]).tolist(),
                        "quaternion_xyzw": quat.tolist(),
                        "projected_cuboid": kps2d.astype(int).tolist(),
                        "scale": np.asarray(ex["scales"][i]).tolist(),
                        "keypoints_3d": np.asarray(ex["points_3d"][i])[:9].tolist(),
                    }
                )
            cam = {}
            if "intrinsics" in ex:
                k = np.asarray(ex["intrinsics"])
                cam["intrinsics"] = {
                    # Objectron stores intrinsics transposed relative to image
                    # x/y (data/utils.py:115-121).
                    "fx": float(k[1, 1]), "fy": float(k[0, 0]),
                    "cx": float(k[1, 2]), "cy": float(k[0, 2]),
                }
            if "projection" in ex:
                cam["camera_projection_matrix"] = np.asarray(
                    ex["projection"]
                ).tolist()
            if "view" in ex:
                cam["camera_view_matrix"] = np.asarray(ex["view"]).tolist()
            record = {
                "camera_data": {"width": w, "height": h, **cam},
                "objects": objects,
            }
            if "plane" in ex:
                record["AR_data"] = {
                    "plane_center": np.asarray(ex["plane"][0]).tolist(),
                    "plane_normal": np.asarray(ex["plane"][1]).tolist(),
                }

            frame_id = ex.get("image_id", count)
            img.save(os.path.join(out_dir, f"{frame_id:05d}.png"))
            with open(os.path.join(out_dir, f"{frame_id:05d}.json"), "w") as f:
                json.dump(record, f)
            count += 1
    print(f"wrote {count} frames")


if __name__ == "__main__":
    main()
