#!/usr/bin/env python
"""Demo entry point: single image / folder inference with pose visualization.

Parity target: src/demo.py (image/folder modes, per-stage timing print
tot/pre/net/dec/post/merge/pnp/track — demo.py:19,54-57). Video/webcam modes use the
tracking detector when --tracking is set.
"""

import argparse
import glob
import json
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="centerpose_tpu demo")
    p.add_argument("--demo", required=True, help="image / folder path")
    p.add_argument("--arch", default="dlav1_34")
    p.add_argument("--c", dest="category", default="shoe")
    p.add_argument("--load_model", default="", help="orbax dir or torch .pth")
    p.add_argument("--tracking", action="store_true")
    p.add_argument("--vis_thresh", type=float, default=0.3)
    p.add_argument("--rep_mode", type=int, default=1)
    p.add_argument("--cam_intrinsic", type=float, nargs=9, default=None)
    p.add_argument("--out_dir", default="demo_out")
    p.add_argument("--save_json", action="store_true", default=True)
    p.add_argument("--debug", type=int, default=0, help=">0 saves visualizations")
    p.add_argument(
        "--batch_size", type=int, default=1,
        help="folder mode: batch the network pass over N images (TPU serving path)",
    )
    p.add_argument(
        "--keep_res", action="store_true",
        help="keep input resolution, pad to the arch's alignment "
             "(opts.py --keep_res; per-shape jit retrace)",
    )
    p.add_argument(
        "--fix_short", type=int, default=-1,
        help="resize the short side to this, round the long side up to x64 "
             "(opts.py --fix_short)",
    )
    p.add_argument("--input_res", type=int, default=512)
    p.add_argument(
        "--dcn_impl", default="gather",
        choices=("gather", "onehot", "onehot_exact"),
        help="DCN sampler: 'gather' (exact, runs everywhere) or 'onehot' "
        "(Pallas MXU kernel — the fast TPU serving path, see NOTES_PERF.md)",
    )
    p.add_argument(
        "--compute_dtype", default="float32",
        choices=("float32", "bfloat16"),
        help="net compute dtype (bfloat16 for TPU serving)",
    )
    return p.parse_args()


def load_detector(args):
    from centerpose_tpu.config import SYMMETRIC_CATEGORIES, preset
    from centerpose_tpu.inference.detector import Detector

    name = "centerpose_track" if args.tracking else (
        "centerpose" if args.arch.startswith("dlav1") else "centerpose_dla"
    )
    cfg = preset(
        name,
        arch=args.arch if not args.tracking else "dla_34",
        category=args.category,
        vis_thresh=args.vis_thresh,
        rep_mode=args.rep_mode,
        fix_res=not args.keep_res,
        fix_short=args.fix_short,
        input_h=args.input_res,
        input_w=args.input_res,
        dcn_impl=args.dcn_impl,
        compute_dtype=args.compute_dtype,
    )
    variables = None
    if args.load_model:
        variables = _load_variables(args.load_model, cfg)
    return Detector(cfg, variables)


def _load_variables(path, cfg):
    import jax

    from centerpose_tpu.models import create_model
    from centerpose_tpu.models.convert import convert_state_dict, load_pth

    if path.endswith(".pth"):
        import jax.numpy as jnp

        model = create_model(cfg)
        dummy = jnp.zeros((1, cfg.input_h, cfg.input_w, 3), jnp.float32)
        kwargs = {}
        if cfg.tracking_task:
            kwargs = dict(
                pre_img=dummy,
                pre_hm=jnp.zeros((1, cfg.input_h, cfg.input_w, 1)),
                pre_hm_hp=jnp.zeros((1, cfg.input_h, cfg.input_w, 8)),
            )
        template = model.init(jax.random.PRNGKey(0), dummy, **kwargs)
        return convert_state_dict(load_pth(path), template, use_gn=cfg.use_conv_gru)
    # orbax train-state checkpoint
    from centerpose_tpu.models import create_model as _cm
    from centerpose_tpu.training.trainer import create_train_state
    from centerpose_tpu.utils.checkpoint import load_checkpoint

    model = _cm(cfg)
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))
    state, _ = load_checkpoint(path, state)
    return {"params": state.params, "batch_stats": state.batch_stats}


def _frames(args):
    """Yield (name, image). Video files / frame dirs (with --tracking) stream in
    order; otherwise each image is independent."""
    from PIL import Image

    if args.demo == "webcam" or args.demo.startswith("/dev/video"):
        # Live capture (reference demo.py:31-57, cv2.VideoCapture(0)).
        from centerpose_tpu.data.webcam import V4L2Camera

        device = "/dev/video0" if args.demo == "webcam" else args.demo
        with V4L2Camera(device) as cam:
            for i, frame in enumerate(cam):
                yield f"cam_{i:05d}", frame
        return
    is_video = args.demo.lower().endswith((".mp4", ".mov", ".webm", ".avi"))
    if is_video or (args.tracking and os.path.isdir(args.demo)):
        from centerpose_tpu.data.video import open_video

        for i, frame in enumerate(open_video(args.demo)):
            yield f"frame_{i:05d}", frame
        return
    if os.path.isdir(args.demo):
        exts = ("*.png", "*.jpg", "*.jpeg")
        files = sorted(sum([glob.glob(os.path.join(args.demo, e)) for e in exts], []))
    else:
        files = [args.demo]
    for path in files:
        yield os.path.basename(path), np.asarray(Image.open(path).convert("RGB"))


def main():
    args = parse_args()
    from centerpose_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    detector = load_detector(args)
    detector.debug_level = args.debug
    os.makedirs(args.out_dir, exist_ok=True)

    meta = {}
    if args.cam_intrinsic is not None:
        meta["camera_matrix"] = np.array(args.cam_intrinsic).reshape(3, 3)

    from PIL import Image

    def emit(path, img, out):
        times = out.get("times")
        if times:
            print(
                f"{os.path.basename(path)}: "
                + "|".join(f"{k} {v:.3f}s" for k, v in times.items())
            )
        if args.save_json:
            record = {
                "image": path,
                "detections": [
                    {
                        "score": d["score"],
                        "location": d.get("location"),
                        "quaternion_xyzw": d.get("quaternion_xyzw"),
                        "obj_scale": np.asarray(d["obj_scale"]).tolist(),
                        "kps": np.asarray(d["kps"]).tolist(),
                        "bbox": np.asarray(d["bbox"]).tolist(),
                    }
                    for d in out["results"]
                ],
            }
            base = os.path.splitext(os.path.basename(path))[0]
            with open(os.path.join(args.out_dir, base + ".json"), "w") as f:
                json.dump(record, f, indent=1)
        if args.debug > 0:
            from centerpose_tpu.utils.visualize import draw_detections

            vis = draw_detections(img, out["results"], out["boxes"])
            base = os.path.splitext(os.path.basename(path))[0]
            Image.fromarray(vis).save(os.path.join(args.out_dir, base + ".png"))
        if args.debug >= 2:
            # Full reference canvas set (object_pose.py:199-313 debug levels).
            base = os.path.splitext(os.path.basename(path))[0]
            dbg = detector.render_debug(img, out)
            dbg.save_all_imgs(os.path.join(args.out_dir, "debug"), prefix=base + "_")

    if args.batch_size > 1 and not args.tracking:
        # Pipelined batched serving: chunk N's host post/merge/PnP overlaps
        # chunk N+1's device work (detector.run_batch_stream).
        def chunks():
            buf = []
            for path, img in _frames(args):
                buf.append((path, img))
                if len(buf) == args.batch_size:
                    yield buf
                    buf = []
            if buf:
                yield buf

        pending = []

        def feed():
            for buf in chunks():
                pending.append(buf)
                yield [im for _, im in buf], [meta or None] * len(buf)

        for outs in detector.run_batch_stream(feed()):
            buf = pending.pop(0)
            for (pth, im), out in zip(buf, outs):
                emit(pth, im, out)
        return

    for path, img in _frames(args):
        out = detector.run(img, meta or None)
        emit(path, img, out)


if __name__ == "__main__":
    main()
