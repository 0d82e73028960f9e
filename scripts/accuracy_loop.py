#!/usr/bin/env python
"""Closed-loop accuracy protocol: synthetic data → train.py → evaluate.py → AP.

Exercises the full chain the reference exists for — data → targets → loss →
train → checkpoint → detector (net → decode → PnP → scale recovery) → Objectron
AP (reference eval_image_official.py:129-1183) — on synthetic DOPE-format data
with exact GT (centerpose_tpu/data/synthetic.py), using the REAL CLIs as
subprocesses. Writes an ACCURACY artifact JSON with the held-out AP per family.

Protocol (defaults): 384 train frames (24 videos × 16) + 48 held-out frames,
res_18 @ 256², batch 16, Adam 4e-4, 100 epochs (~2.4k steps). Runs on whatever
backend `python` sees (the TPU chip under axon; CPU with JAX_PLATFORMS=cpu).
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, env=None):
    print("+ " + " ".join(cmd), flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    subprocess.run(cmd, check=True, cwd=REPO, env=e)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--work_dir", default="exp/accuracy")
    p.add_argument("--train_dir", default="",
                   help="use an existing train set instead of generating "
                        "{work_dir}/data_train")
    p.add_argument("--val_dir_override", default="",
                   help="use an existing held-out set")
    p.add_argument("--arch", default="res_18")
    p.add_argument("--input_res", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--lr_step", default="",
                   help="forwarded to train.py (LR /10 drop epochs)")
    p.add_argument("--train_videos", type=int, default=24)
    p.add_argument("--train_frames", type=int, default=16)
    p.add_argument("--val_videos", type=int, default=6)
    p.add_argument("--val_frames", type=int, default=8)
    p.add_argument("--img_size", type=int, default=480)
    p.add_argument("--dcn_impl", default="gather",
                   help="res_18 has no DCN; relevant for dla archs")
    p.add_argument("--compute_dtype", default="float32")
    p.add_argument("--eval_compute_dtype", default="",
                   help="override eval precision (A/B: bfloat16 vs float32)")
    p.add_argument("--out", default="ACCURACY_r04.json")
    p.add_argument("--skip_train", action="store_true",
                   help="reuse the existing checkpoint, only evaluate")
    p.add_argument("--max_images", type=int, default=0)
    args = p.parse_args()

    train_dir = args.train_dir or os.path.join(args.work_dir, "data_train")
    val_dir = args.val_dir_override or os.path.join(args.work_dir, "data_val")
    exp_id = "accuracy_loop"
    ckpt = os.path.join("exp", args.arch, exp_id, "best")

    py = sys.executable
    if not os.path.isdir(train_dir):
        run([py, "scripts/make_synthetic_dataset.py", "--out", train_dir,
             "--n_videos", str(args.train_videos),
             "--frames", str(args.train_frames),
             "--width", str(args.img_size), "--height", str(args.img_size),
             "--seed", "0"])
    if not os.path.isdir(val_dir):
        run([py, "scripts/make_synthetic_dataset.py", "--out", val_dir,
             "--n_videos", str(args.val_videos),
             "--frames", str(args.val_frames),
             "--width", str(args.img_size), "--height", str(args.img_size),
             "--seed", "777"])

    t_train = 0.0
    if not args.skip_train:
        t0 = time.time()
        run([py, "train.py", "--data_dir", train_dir, "--val_dir", val_dir,
             "--exp_id", exp_id, "--c", "shoe", "--arch", args.arch,
             "--batch_size", str(args.batch_size), "--lr", str(args.lr),
             "--num_epochs", str(args.num_epochs),
             "--input_res", str(args.input_res),
             "--val_intervals", "10", "--save_intervals", "50",
             "--dcn_impl", args.dcn_impl,
             "--compute_dtype", args.compute_dtype]
            + (["--lr_step", args.lr_step] if args.lr_step else []))
        t_train = time.time() - t0

    report_json = os.path.join(args.work_dir, "report.json")
    eval_dtype = args.eval_compute_dtype or "float32"
    cmd = [py, "evaluate.py", "--mode", "metric", "--data_dir", val_dir,
           "--c", "shoe", "--arch", args.arch,
           "--input_res", str(args.input_res),
           "--load_model", ckpt, "--report_json", report_json,
           "--compute_dtype", eval_dtype]
    if args.max_images:
        cmd += ["--max_images", str(args.max_images)]
    run(cmd)

    with open(report_json) as f:
        report = json.load(f)
    fams = report["families"]
    artifact = {
        "metric": "heldout_synthetic_ap",
        "value": round(fams["iou3d"]["ap"], 4),
        "unit": "AP@3DIoU>=0.5",
        "vs_baseline": round(fams["iou3d"]["ap"] / 0.9, 4),
        "protocol": {
            "arch": args.arch, "input_res": args.input_res,
            "batch_size": args.batch_size, "lr": args.lr,
            "num_epochs": args.num_epochs,
            "train_frames": sum(
                len([f for f in os.listdir(os.path.join(train_dir, d))
                     if f.endswith(".png")])
                for d in os.listdir(train_dir)
                if os.path.isdir(os.path.join(train_dir, d))
            ),
            "heldout_frames": args.val_videos * args.val_frames,
            "img_size": args.img_size,
            "train_wall_s": round(t_train, 1),
            "eval_compute_dtype": eval_dtype,
            "chain": "data->targets->loss->train->ckpt->detector->decode->"
                     "pnp->scale-recovery->iou->AP (real train.py+evaluate.py)",
        },
        "ap": {k: round(v["ap"], 4) for k, v in fams.items()},
        "num_gt": report["num_gt"],
        "num_pred": report["num_pred"],
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact["ap"]))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
