#!/usr/bin/env python
"""Convert a DOPE-format png+json dataset into per-video Objectron TFRecords.

One .tfrecord per video directory, frames in order, with the tf.Example field
layout the evaluator's native parser consumes (data/tfrecord.py KEYS — the
Objectron schema keys, objectron/dataset/parser.py:93-228). This feeds the
synthetic exact-GT datasets (data/synthetic.py) into the TFRecord eval path:
video tracking eval, GT-seed ablation modes, --n_proc sharding, --eval_continue.

Conventions written (matching parse_objectron_example + evaluate_tfrecords):
  * point_2d: [x/width, y/height, 1.0] per keypoint (normalized, 9/instance);
  * point_3d / translation / orientation / plane: OpenGL camera frame;
  * camera/intrinsics: stored TRANSPOSED relative to image x/y — the reference
    swaps fx/fy and cx/cy on read (data/utils.py:115-121, evaluator.py:558-562).
"""

import argparse
import glob
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402


def convert_video(vdir: str, out_path: str, category: str) -> int:
    from scipy.spatial.transform import Rotation as R

    from centerpose_tpu.data.tfrecord import make_example, write_tfrecord

    payloads = []
    vid = os.path.basename(os.path.normpath(vdir))
    for idx, jpath in enumerate(sorted(glob.glob(os.path.join(vdir, "*.json")))):
        img_path = os.path.splitext(jpath)[0] + ".png"
        if not os.path.exists(img_path):
            continue
        with open(jpath) as f:
            ann = json.load(f)
        with open(img_path, "rb") as f:
            img_bytes = f.read()
        cam = ann["camera_data"]
        w, h = cam["width"], cam["height"]
        intr = cam["intrinsics"]
        objs = ann.get("objects", [])
        n = len(objs)

        p2, p3, scales, trans, rots = [], [], [], [], []
        for o in objs:
            pc = np.asarray(o["projected_cuboid"], np.float64)[:9]
            p2.extend(
                [pc[i, 0] / w, pc[i, 1] / h, 1.0] for i in range(9)
            )
            p3.extend(np.asarray(o["keypoints_3d"], np.float64)[:9].tolist())
            scales.extend(np.abs(np.asarray(o["scale"], np.float64)).tolist())
            trans.extend(o["location"])
            rots.extend(
                R.from_quat(o["quaternion_xyzw"]).as_matrix().ravel().tolist()
            )
        # Transposed intrinsics (the parser swaps back on read).
        k = [intr["fy"], 0.0, intr["cy"], 0.0, intr["fx"], intr["cx"],
             0.0, 0.0, 1.0]
        features = {
            "image/encoded": ("bytes", [img_bytes]),
            "image/filename": ("bytes", [f"{category}/{vid}/{idx}".encode()]),
            "image/id": ("int64", [idx]),
            "image/width": ("int64", [w]),
            "image/height": ("int64", [h]),
            "instance_num": ("int64", [n]),
            "point_num": ("int64", [9] * n),
            "point_2d": ("float", np.asarray(p2, np.float64).ravel().tolist()),
            "point_3d": ("float", np.asarray(p3, np.float64).ravel().tolist()),
            "object/scale": ("float", scales),
            "object/translation": ("float", trans),
            "object/orientation": ("float", rots),
            "object/visibility": ("float", [1.0] * n),
            "camera/intrinsics": ("float", k),
        }
        if "camera_projection_matrix" in cam:
            features["camera/projection"] = (
                "float",
                np.asarray(cam["camera_projection_matrix"]).ravel().tolist(),
            )
        if "AR_data" in ann:
            features["plane/center"] = ("float", ann["AR_data"]["plane_center"])
            features["plane/normal"] = ("float", ann["AR_data"]["plane_normal"])
        payloads.append(make_example(features))
    write_tfrecord(out_path, payloads)
    return len(payloads)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_dir", required=True, help="DOPE dataset root")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--c", dest="category", default="shoe")
    args = p.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    total = 0
    for vdir in sorted(
        d for d in glob.glob(os.path.join(args.data_dir, "*")) if os.path.isdir(d)
    ):
        vid = os.path.basename(vdir)
        out = os.path.join(args.out_dir, f"{vid}.tfrecord")
        n = convert_video(vdir, out, args.category)
        total += n
        print(f"{vid}: {n} frames -> {out}")
    print(f"total {total} frames")


if __name__ == "__main__":
    main()
