#!/usr/bin/env python
"""Evaluation entry points.

Two modes, mirroring the reference's two harness entry points:
  * `--mode loss`   — replay checkpoints through the validation loss
                      (src/test.py:25-224 parity);
  * `--mode metric` — full Objectron-style AP evaluation over a DOPE-format dataset
                      (src/tools/objectron_eval/eval_image_official.py /
                      eval_video_official.py parity; see
                      centerpose_tpu/evaluation/evaluator.py).
"""

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser(description="centerpose_tpu evaluation")
    p.add_argument("--mode", choices=("loss", "metric"), default="metric")
    p.add_argument("--data_dir", default="")
    p.add_argument("--c", dest="category", default="shoe")
    p.add_argument("--arch", default="dlav1_34")
    p.add_argument("--load_model", default="")
    p.add_argument("--tracking", action="store_true")
    p.add_argument("--eval_num_symmetry", type=int, default=0, help="0 = auto")
    p.add_argument("--max_images", type=int, default=0)
    p.add_argument("--report_file", default="")
    p.add_argument("--report_json", default="",
                   help="write the machine-readable AP report (per-family "
                        "report-point AP + full 21-threshold curves) as JSON")
    p.add_argument("--input_res", type=int, default=512)
    p.add_argument("--vis_thresh", type=float, default=0.0,
                   help="override the detection confidence threshold "
                        "(eval_opts.py --eval_confidence parity); tracking "
                        "eval also applies it to the track-spawn threshold. "
                        "0 = preset default (0.3)")
    p.add_argument(
        "--dcn_impl", default="gather",
        choices=("gather", "onehot", "onehot_exact"),
        help="DCN sampler ('onehot' = fast Pallas TPU path)",
    )
    p.add_argument("--compute_dtype", default="float32",
                   choices=("float32", "bfloat16"))
    p.add_argument(
        "--all_checkpoints", action="store_true",
        help="loss mode: replay every epoch_*/best/ckpt dir under --load_model "
             "(src/test.py parity)",
    )
    # Video-eval ablations (shell_eval_video_CenterPoseTrack.py mode presets).
    p.add_argument("--eval_gt_pre_hm_first", action="store_true")
    p.add_argument("--eval_add_noise", action="store_true")
    p.add_argument("--eval_fake_output", action="store_true")
    p.add_argument("--eval_empty_pre_hm", action="store_true")
    p.add_argument(
        "--eval_CenterPose_initialization", action="store_true",
        help="seed the tracker's first frame with a CenterPose image model "
             "(MODE_5, eval_video_official.py:392-480)",
    )
    p.add_argument(
        "--eval_MobilePose_postprocessing", action="store_true",
        help="replace PnP with MobilePose EPnP 2D→3D lifting "
             "(eval_image_official.py:805-862)",
    )
    p.add_argument(
        "--eval_gt_scale", action="store_true",
        help="re-run PnP with the matched GT's scale "
             "(predict_gt_scale, eval_image_official.py:228-241)",
    )
    p.add_argument(
        "--init_load_model", default="",
        help="checkpoint for the CenterPose-initialization image model",
    )
    p.add_argument("--no_kalman", action="store_true")
    p.add_argument(
        "--video_eval", action="store_true",
        help="force video-sequence eval semantics (per-video reset + "
             "consistency over raw detections) for a plain image model — "
             "the null config of the KF-baseline ablation",
    )
    p.add_argument("--no_scale_pool", action="store_true")
    p.add_argument("--refined_kalman", action="store_true")
    p.add_argument("--tfrecords", default="",
                   help="evaluate Objectron tfrecords (glob) instead of --data_dir")
    p.add_argument("--stats_save", default="",
                   help="dump raw hit/conf records for scripts/group_report.py")
    p.add_argument(
        "--eval_continue", action="store_true",
        help="resumable eval (eval_video_official.py:1599-1602 parity): "
             "--stats_save names a DIRECTORY; each video's raw stats are "
             "written as <dir>/<video_id>.json and videos with an existing "
             "stats file are skipped on restart (their records are merged "
             "into the report). The video-consistency score is not "
             "recomputable from merged stats and is omitted.",
    )
    p.add_argument("--n_proc", type=int, default=1,
                   help="evaluate videos in N worker processes "
                        "(eval_video_official.py:1639-1675 parity); composes "
                        "with --eval_continue for killable/resumable sweeps")
    p.add_argument(
        "--eval_hard_case", type=int, default=0, choices=(0, 1, 2),
        help="evaluate a video subset: 1 = ids from --eval_hard_case_file "
             "(hard_cases.json: {category: [video_id, ...]}), 2 = ids from "
             "--eval_hard_case_list (eval_video_official.py:1574-1603)",
    )
    p.add_argument("--eval_hard_case_list", nargs="*", default=[])
    p.add_argument("--eval_hard_case_file", default="hard_cases.json")
    # Cup/mug dual-model path (eval_image_official.py:166-226,297-346).
    p.add_argument(
        "--mug_model", default="",
        help="category 'cup' only: checkpoint for the MUG sub-model; samples "
             "are routed between it and --load_model (the 12-fold-symmetric "
             "cup sub-model) by the hand relabel lists",
    )
    p.add_argument(
        "--label_dir", default="",
        help="directory with the cup/mug relabel lists "
             "(label/cup/{cup,mug_left,mug_right}_list.txt; defaults to "
             "$CENTERPOSE_LABEL_DIR)",
    )
    p.add_argument(
        "--mug_only", choices=("all", "mug", "cup"), default="all",
        help="cup category: restrict to mug-only or cup-only samples "
             "(eval_image_official.py:336-346)",
    )
    p.add_argument(
        "--eval_mug_symmetric", type=int, default=1,
        help="1 (default): mugs also get the rotation-symmetry sweep (the "
             "Objectron-paper convention); 0: matched mugs skip the sweep",
    )
    return p.parse_args()


def _hard_case_filter(args):
    """Video-id subset for --eval_hard_case (reference parity)."""
    if args.eval_hard_case == 1:
        import json

        with open(args.eval_hard_case_file) as f:
            cases = json.load(f)
        ids = cases.get(args.category, cases if isinstance(cases, list) else [])
        return [str(v[0]) if isinstance(v, (list, tuple)) else str(v)
                for v in ids]
    if args.eval_hard_case == 2:
        return [str(v) for v in args.eval_hard_case_list]
    return None


def _eval_shard(records, cfg, max_images, tracking, ablation, load_model="",
                eval_num_symmetry=None, mug_kw=None) -> str:
    """Worker: evaluate a video shard, return raw stats json (spawn-safe)."""
    import tempfile

    from centerpose_tpu.evaluation.evaluator import evaluate_tfrecords
    from centerpose_tpu.inference.detector import Detector

    variables = None
    if load_model:
        from demo import _load_variables

        variables = _load_variables(load_model, cfg)
    detector = Detector(cfg, variables)
    detector_mug, mug_eval_kw = _build_mug_detector(cfg, mug_kw or {})
    ev = evaluate_tfrecords(
        detector, records, cfg, max_images=max_images or None,
        is_video=tracking, ablation=ablation,
        eval_num_symmetry=eval_num_symmetry,
        detector_mug=detector_mug, **mug_eval_kw,
    )
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=True) as f:
        ev.save_stats(f.name)
        with open(f.name) as fr:
            return fr.read()


def _eval_continue_shard(videos, stats_save, cfg, max_images, tracking,
                         ablation, load_model="", eval_num_symmetry=None,
                         mug_kw=None, data_dir=""):
    """Worker for --eval_continue --n_proc N (spawn-safe): evaluate the
    shard's pending videos ONE AT A TIME, persisting <stats_save>/<vid>.json
    atomically after each — a killed sweep resumes mid-shard
    (eval_video_official.py:1599-1602 resume inside the :1639-1675 pool)."""
    from centerpose_tpu.evaluation.evaluator import (
        evaluate_dataset,
        evaluate_tfrecords,
    )
    from centerpose_tpu.inference.detector import Detector

    variables = None
    if load_model:
        from demo import _load_variables

        variables = _load_variables(load_model, cfg)
    detector = Detector(cfg, variables)
    detector_mug, mug_eval_kw = _build_mug_detector(cfg, mug_kw or {})
    for vid, record in videos:
        stats_path = os.path.join(stats_save, f"{vid}.json")
        if os.path.exists(stats_path):
            continue
        if record is not None:
            ev = evaluate_tfrecords(
                detector, [record], cfg, max_images=max_images or None,
                is_video=tracking, ablation=ablation,
                eval_num_symmetry=eval_num_symmetry,
                detector_mug=detector_mug, **mug_eval_kw,
            )
        else:
            ev = evaluate_dataset(
                detector, data_dir, cfg, max_images=max_images or None,
                is_video=tracking, eval_num_symmetry=eval_num_symmetry,
                video_filter=[vid],
            )
        tmp = f"{stats_path}.tmp{os.getpid()}"
        ev.save_stats(tmp)
        os.replace(tmp, stats_path)


def _build_mug_detector(cfg, mug_kw):
    """Build the MUG sub-model detector + evaluate_tfrecords kwargs for the
    cup dual-model path (eval_image_official.py:166-182). mug_kw carries
    {mug_model, label_dir, mug_only, eval_mug_symmetric} from the CLI."""
    if cfg.category != "cup" or not mug_kw:
        return None, {}
    from centerpose_tpu.config import preset
    from centerpose_tpu.evaluation.relabel import RelabelLists
    from centerpose_tpu.inference.detector import Detector

    detector_mug = None
    if mug_kw.get("mug_model"):
        # The mug sub-model: same arch, non-symmetric (preset skips the
        # 12-fold cup symmetry when mug=True).
        mug_cfg = preset(
            "centerpose" if cfg.arch.startswith("dlav1") else "centerpose_dla",
            category="cup", mug=True, arch=cfg.arch,
            input_h=cfg.input_h, input_w=cfg.input_w,
            dcn_impl=cfg.dcn_impl, compute_dtype=cfg.compute_dtype,
        )
        from demo import _load_variables

        mug_vars = _load_variables(mug_kw["mug_model"], mug_cfg)
        detector_mug = Detector(mug_cfg, mug_vars)
    mug_only = {"all": None, "mug": True, "cup": False}[
        mug_kw.get("mug_only", "all")
    ]
    return detector_mug, {
        "relabel": RelabelLists.resolve(mug_kw.get("label_dir") or None),
        "mug_only": mug_only,
        "eval_mug_symmetric": bool(mug_kw.get("eval_mug_symmetric", 1)),
    }


def _eval_continue(args, cfg, detector, ablation, init_detector, mug_kw,
                   hard_ids):
    """Resumable per-video evaluation (eval_video_official.py:1599-1602):
    evaluate one video at a time, persist its raw stats as
    <stats_save>/<video_id>.json, and on restart merge existing files instead
    of re-running their videos."""
    from centerpose_tpu.evaluation.evaluator import (
        Evaluator,
        evaluate_dataset,
        evaluate_tfrecords,
    )

    if not args.stats_save:
        raise SystemExit("--eval_continue requires --stats_save DIR")
    os.makedirs(args.stats_save, exist_ok=True)

    if args.tfrecords:
        import glob as _glob

        records = sorted(_glob.glob(args.tfrecords))
        videos = [
            (os.path.splitext(os.path.basename(r))[0], r) for r in records
        ]
    else:
        from centerpose_tpu.data.dataset import find_samples

        vids = sorted({s[1] for s in find_samples(args.data_dir)})
        videos = [(v, None) for v in vids]
    if hard_ids is not None:
        keep = set(hard_ids)
        videos = [(v, r) for v, r in videos if v in keep]

    if args.n_proc > 1 and len(videos) > 1:
        # Resumable multiprocess sweep (eval_video_official.py:1599-1602
        # resume composed with the :1639-1675 pool): round-robin the PENDING
        # videos over spawn workers; each worker persists per-video stats
        # atomically, so a killed sweep resumes from whatever any worker
        # finished. The parent only merges stats files.
        import multiprocessing as mp

        done = {v for v, _ in videos
                if os.path.exists(os.path.join(args.stats_save, f"{v}.json"))}
        for vid in sorted(done):
            print(f"eval_continue: skipping {vid} (stats exist)", flush=True)
        pending = [(v, r) for v, r in videos if v not in done]
        if pending:
            shards = [pending[i::args.n_proc] for i in range(args.n_proc)]
            ctx = mp.get_context("spawn")
            with ctx.Pool(args.n_proc) as pool:
                pool.starmap(
                    _eval_continue_shard,
                    [(shard, args.stats_save, cfg, args.max_images,
                      args.video_eval, ablation, args.load_model,
                      args.eval_num_symmetry or None, mug_kw, args.data_dir)
                     for shard in shards if shard],
                )
        merged = Evaluator(cfg, args.eval_num_symmetry or None)
        for vid, _ in videos:
            stats_path = os.path.join(args.stats_save, f"{vid}.json")
            if os.path.exists(stats_path):
                merged.load_and_merge(stats_path)
        return merged

    detector_mug, mug_eval_kw = _build_mug_detector(cfg, mug_kw)
    merged = Evaluator(cfg, args.eval_num_symmetry or None,
                       **({"eval_mug_symmetric":
                           mug_eval_kw["eval_mug_symmetric"]}
                          if mug_eval_kw else {}))
    for vid, record in videos:
        stats_path = os.path.join(args.stats_save, f"{vid}.json")
        if os.path.exists(stats_path):
            print(f"eval_continue: skipping {vid} (stats exist)", flush=True)
            merged.load_and_merge(stats_path)
            continue
        if record is not None:
            ev = evaluate_tfrecords(
                detector, [record], cfg,
                max_images=args.max_images or None,
                is_video=args.video_eval, ablation=ablation,
                eval_num_symmetry=args.eval_num_symmetry or None,
                mobilepose_postprocess=args.eval_MobilePose_postprocessing,
                gt_scale=args.eval_gt_scale, init_detector=init_detector,
                detector_mug=detector_mug, **mug_eval_kw,
            )
        else:
            ev = evaluate_dataset(
                detector, args.data_dir, cfg,
                max_images=args.max_images or None,
                is_video=args.video_eval,
                eval_num_symmetry=args.eval_num_symmetry or None,
                mobilepose_postprocess=args.eval_MobilePose_postprocessing,
                gt_scale=args.eval_gt_scale, video_filter=[vid],
            )
        tmp = stats_path + ".tmp"
        ev.save_stats(tmp)
        os.replace(tmp, stats_path)  # atomic: a killed run never half-writes
        merged.load_and_merge(stats_path)
    return merged


def main():
    args = parse_args()
    if not args.data_dir and not args.tfrecords:
        raise SystemExit("one of --data_dir / --tfrecords is required")
    from centerpose_tpu.config import preset
    from centerpose_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    # Video-sequence evaluation semantics (per-video tracker reset +
    # consistency scoring) apply to the Track pipeline AND the CenterPose+KF
    # baseline (tracker_baseline.py via --refined_kalman).
    args.video_eval = (args.tracking or args.refined_kalman
                       or args.video_eval)
    name = "centerpose_track" if args.tracking else (
        "centerpose" if args.arch.startswith("dlav1") else "centerpose_dla"
    )
    overrides = {}
    if args.vis_thresh > 0:
        overrides["vis_thresh"] = args.vis_thresh
        overrides["new_thresh"] = args.vis_thresh
    if args.eval_empty_pre_hm:
        overrides["empty_pre_hm"] = True
    if args.no_kalman:
        overrides["use_kalman"] = False
    if args.no_scale_pool:
        overrides["use_scale_pool"] = False
    if args.refined_kalman:
        overrides["refined_kalman"] = True
    cfg = preset(
        name,
        category=args.category,
        arch=args.arch if not args.tracking else "dla_34",
        input_h=args.input_res,
        input_w=args.input_res,
        dcn_impl=args.dcn_impl,
        compute_dtype=args.compute_dtype,
        **overrides,
    )

    if args.mode == "metric":
        from centerpose_tpu.inference.detector import Detector
        from demo import _load_variables

        variables = (
            _load_variables(args.load_model, cfg) if args.load_model else None
        )
        detector = Detector(cfg, variables)

        from centerpose_tpu.evaluation.evaluator import (
            EvalAblation,
            evaluate_dataset,
            evaluate_tfrecords,
        )

        ablation = EvalAblation(
            gt_pre_hm_first=args.eval_gt_pre_hm_first,
            add_noise=args.eval_add_noise,
            fake_output=args.eval_fake_output,
            centerpose_init=args.eval_CenterPose_initialization,
        )
        init_detector = None
        if args.eval_CenterPose_initialization:
            # A CenterPose IMAGE model (dlav1_34) seeding the tracker (MODE_5).
            init_cfg = preset(
                "centerpose", category=args.category,
                input_h=args.input_res, input_w=args.input_res,
                dcn_impl=args.dcn_impl, compute_dtype=args.compute_dtype,
            )
            init_vars = (
                _load_variables(args.init_load_model, init_cfg)
                if args.init_load_model else None
            )
            init_detector = Detector(init_cfg, init_vars)
        mug_kw = {
            "mug_model": args.mug_model,
            "label_dir": args.label_dir,
            "mug_only": args.mug_only,
            "eval_mug_symmetric": args.eval_mug_symmetric,
        }
        hard_ids = _hard_case_filter(args)
        if args.eval_continue:
            evaluator = _eval_continue(args, cfg, detector, ablation,
                                       init_detector, mug_kw, hard_ids)
        elif args.tfrecords:
            import glob as _glob

            records = sorted(_glob.glob(args.tfrecords))
            if hard_ids is not None:
                keep = set(hard_ids)
                records = [
                    r for r in records
                    if os.path.splitext(os.path.basename(r))[0] in keep
                ]
            if args.n_proc > 1 and len(records) > 1:
                # Embarrassingly-parallel per-video shards, merged via the raw
                # hit/conf records (no inter-process communication — SURVEY §2.2).
                import multiprocessing as mp

                shards = [records[i :: args.n_proc] for i in range(args.n_proc)]
                ctx = mp.get_context("spawn")
                with ctx.Pool(args.n_proc) as pool:
                    payloads = pool.starmap(
                        _eval_shard,
                        [
                            (shard, cfg, args.max_images, args.video_eval,
                             ablation, args.load_model,
                             args.eval_num_symmetry or None, mug_kw)
                            for shard in shards
                            if shard
                        ],
                    )
                from centerpose_tpu.evaluation.evaluator import Evaluator

                evaluator = Evaluator(cfg)
                import tempfile

                for payload in payloads:
                    with tempfile.NamedTemporaryFile(
                        "w", suffix=".json", delete=False
                    ) as f:
                        f.write(payload)
                        path = f.name
                    evaluator.load_and_merge(path)
                    os.unlink(path)
            else:
                # Built here, NOT before the n_proc fork: each spawn worker
                # rebuilds its own mug detector from mug_kw, so a parent-side
                # build would just hold duplicate weights for the whole run.
                detector_mug, mug_eval_kw = _build_mug_detector(cfg, mug_kw)
                evaluator = evaluate_tfrecords(
                    detector, records, cfg,
                    max_images=args.max_images or None,
                    is_video=args.video_eval,
                    ablation=ablation,
                    eval_num_symmetry=args.eval_num_symmetry or None,
                    mobilepose_postprocess=args.eval_MobilePose_postprocessing,
                    gt_scale=args.eval_gt_scale,
                    init_detector=init_detector,
                    detector_mug=detector_mug,
                    **mug_eval_kw,
                )
        else:
            evaluator = evaluate_dataset(
                detector,
                args.data_dir,
                cfg,
                max_images=args.max_images or None,
                is_video=args.video_eval,
                eval_num_symmetry=args.eval_num_symmetry or None,
                mobilepose_postprocess=args.eval_MobilePose_postprocessing,
                gt_scale=args.eval_gt_scale,
                video_filter=hard_ids,
            )
        report = evaluator.report()
        print(report)
        if args.report_file:
            os.makedirs(os.path.dirname(args.report_file) or ".", exist_ok=True)
            with open(args.report_file, "w") as f:
                f.write(report + "\n")
        if args.report_json:
            import json as _json

            os.makedirs(os.path.dirname(args.report_json) or ".", exist_ok=True)
            with open(args.report_json, "w") as f:
                _json.dump(evaluator.report_dict(), f, indent=1)
        if args.stats_save and not args.eval_continue:
            # (with --eval_continue the per-video files under the stats dir
            # ARE the persisted stats)
            evaluator.save_stats(args.stats_save)
    else:
        import jax
        import numpy as np

        from centerpose_tpu.data.dataset import ObjectPoseDataset, collate_filtered
        from centerpose_tpu.models import create_model
        from centerpose_tpu.training.trainer import create_train_state, make_eval_step
        from centerpose_tpu.utils.checkpoint import load_checkpoint

        model = create_model(cfg)
        eval_fn = make_eval_step(cfg, model)
        ds = ObjectPoseDataset(args.data_dir, cfg, split="val")

        def run_val(state):
            # Sample-count-weighted averages of the per-batch means — the
            # reference's AverageMeter semantics (base_trainer.py
            # update(loss, batch.size(0))); equal-weighting batch means would
            # over-weight the tail partial batch.
            agg, n = {}, 0
            buf = []

            def flush(buf):
                nonlocal n
                batch = collate_filtered(buf)
                if batch is None:
                    return
                stats = eval_fn(state, batch)
                bs = len(buf)
                n += bs
                for k, v in stats.items():
                    agg[k] = agg.get(k, 0.0) + float(v) * bs

            for i in range(len(ds)):
                item = ds[i]
                if item is None:
                    continue
                item.pop("meta", None)
                buf.append(item)
                if len(buf) == 8:
                    flush(buf)
                    buf = []
            if buf:  # tail partial batch (base_trainer runs every batch)
                flush(buf)
            return {k: v / max(n, 1) for k, v in agg.items()}

        if args.all_checkpoints and args.load_model:
            # test.py parity: replay every saved checkpoint through val loss.
            import glob as _glob

            dirs = sorted(
                d for d in _glob.glob(os.path.join(args.load_model, "*"))
                if os.path.isdir(d)
            )
            for d in dirs:
                state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))
                try:
                    state, step = load_checkpoint(d, state)
                except (FileNotFoundError, ValueError):
                    continue
                agg = run_val(state)
                print(
                    f"{os.path.basename(d)} (step {step}): "
                    + " ".join(f"{k}={v:.4f}" for k, v in agg.items())
                )
        else:
            state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))
            if args.load_model:
                state, _ = load_checkpoint(args.load_model, state)
            agg = run_val(state)
            print(" ".join(f"{k}={v:.4f}" for k, v in agg.items()))


if __name__ == "__main__":
    main()
