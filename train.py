#!/usr/bin/env python
"""Training entry point (CenterPose & CenterPoseTrack).

Parity target: src/main_CenterPose.py:25-191 and src/main_CenterPoseTrack.py:118-242
— seed, model+Adam, optional resume, epoch loop with periodic validation,
best/last/periodic checkpoints, LR ÷10 at lr_step epochs (expressed through the
optax schedule as a function of the global step).

TPU-native: ONE jitted train step over a 1-D `data` mesh (params replicated, batch
sharded); the host side only feeds numpy batches.
"""

import argparse
import os
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="centerpose_tpu training")
    p.add_argument("--data_dir", required=True, help="root of png+json training data")
    p.add_argument("--val_dir", default="", help="validation data root")
    p.add_argument("--exp_id", default="default")
    p.add_argument("--c", dest="category", default="shoe")
    p.add_argument("--arch", default="dlav1_34")
    p.add_argument("--tracking_task", action="store_true")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1.25e-4)
    p.add_argument("--num_epochs", type=int, default=0, help="0 = preset default")
    p.add_argument(
        "--lr_step", default="",
        help="comma-separated epochs for the LR ÷10 drops (opts.py --lr_step "
             "parity); empty = preset default (90,120)",
    )
    p.add_argument("--val_intervals", type=int, default=5)
    p.add_argument("--save_intervals", type=int, default=10)
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--load_model", default="",
        help="initialize params from this checkpoint dir with partial "
             "name+shape matching (model.py:34-87 load_model parity — e.g. "
             "Track training initialized from a trained CenterPose model, "
             "main_CenterPoseTrack.py); unlike --resume the optimizer and "
             "step start fresh",
    )
    p.add_argument("--seed", type=int, default=317)
    p.add_argument("--num_devices", type=int, default=0, help="0 = all")
    p.add_argument("--input_res", type=int, default=512)
    p.add_argument(
        "--num_workers", type=int, default=2,
        help="parallel loader workers (main_CenterPose.py num_workers parity); "
             "0 = synchronous",
    )
    p.add_argument(
        "--loader_mode", choices=("thread", "process"), default="thread",
        help="worker kind: threads (numpy releases the GIL; default on the "
             "1-core test host) or spawn processes",
    )
    p.add_argument(
        "--dcn_bwd", choices=("auto", "pallas", "autodiff"), default="auto",
        help="DCN backward: Pallas MXU kernels (ops/dcn_bwd.py) on TPU, or "
             "the remat+chunked gather autodiff",
    )
    p.add_argument(
        "--dcn_impl", choices=("gather", "onehot"), default="gather",
        help="DCN forward: exact gather (reference parity) or the MXU-packed "
             "one-hot Pallas kernels (~1.5x faster 512² b16 train step on "
             "v5e; bilinear weights bf16-quantized, <=2^-9 relative)",
    )
    p.add_argument(
        "--compute_dtype", choices=("float32", "bfloat16"), default="float32",
        help="mixed-precision training: bf16 compute with f32 params/"
             "optimizer/loss (b16 512² v5e: 493 -> 396 ms/step with onehot)",
    )
    p.add_argument(
        "--debug", type=int, default=0,
        help=">0 saves the reference's pred/GT debug canvases for the first "
             "batch of every epoch to exp/.../debug/ "
             "(trains/object_pose.py:218-401 parity)",
    )
    p.add_argument(
        "--mug", action="store_true",
        help="cup category: train the non-symmetric MUG sub-model — selects "
             "mug-relabeled annotations and the mug dimension stats "
             "(opts.py:203,411; dataset_combined.py:361,568)",
    )
    p.add_argument(
        "--use_residual", action="store_true",
        help="scale head predicts log-residuals against the per-category "
             "dimension_ref means (opts.py:408-420, losses.py:165-172)",
    )
    p.add_argument(
        "--use_absolute_scale", action="store_true",
        help="with --use_residual: absolute [w,h,d] reference instead of "
             "height-relative",
    )
    p.add_argument(
        "--wire", choices=("compact", "f32"), default="compact",
        help="loader->device wire format: compact ships uint8 images + uint8 "
             "[0,1] heatmaps and normalizes on device (~4x smaller per-step "
             "payload; decisive over a remote-tunnel device link), f32 ships "
             "the normalized tensors",
    )
    p.add_argument(
        "--new_data_augmentation", action="store_true",
        help="extra raw-image degradations before the affine warp: motion "
             "blur / downscale / gaussian noise (dataset_combined.py:307-318)",
    )
    return p.parse_args()


def main():
    args = parse_args()
    np.random.seed(args.seed)

    import jax

    from centerpose_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from centerpose_tpu.config import preset
    from centerpose_tpu.data.dataset import ObjectPoseDataset
    from centerpose_tpu.data.loader import DataLoader
    from centerpose_tpu.models import create_model
    from centerpose_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from centerpose_tpu.training.trainer import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )
    from centerpose_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from centerpose_tpu.utils.logger import Logger

    name = "centerpose_track" if args.tracking_task else "centerpose"
    cfg = preset(
        name,
        category=args.category,
        arch=args.arch if not args.tracking_task else "dla_34",
        batch_size=args.batch_size,
        lr=args.lr,
        input_h=args.input_res,
        input_w=args.input_res,
        seed=args.seed,
        dcn_bwd=args.dcn_bwd,
        dcn_impl=args.dcn_impl,
        compute_dtype=args.compute_dtype,
        mug=args.mug,
        use_residual=args.use_residual,
        use_absolute_scale=args.use_absolute_scale,
    )
    if args.num_epochs:
        cfg = cfg.replace(num_epochs=args.num_epochs)
    if args.lr_step:
        cfg = cfg.replace(
            lr_step=tuple(int(e) for e in args.lr_step.split(",") if e)
        )

    exp_dir = os.path.join("exp", cfg.arch, args.exp_id)
    logger = Logger(exp_dir, cfg)

    compact = args.wire == "compact"
    train_ds = ObjectPoseDataset(
        args.data_dir, cfg, split="train",
        new_data_aug=args.new_data_augmentation,
        compact_wire=compact,
    )
    val_ds = ObjectPoseDataset(args.val_dir or args.data_dir, cfg, split="val",
                               compact_wire=compact)
    steps_per_epoch = max(1, len(train_ds) // cfg.batch_size)
    logger.write(f"train {len(train_ds)} samples, {steps_per_epoch} steps/epoch")

    model = create_model(cfg)
    state, tx = create_train_state(
        cfg, model, jax.random.PRNGKey(cfg.seed), steps_per_epoch
    )
    start_epoch = 0
    ckpt_dir = os.path.join(exp_dir, "ckpt")
    if args.load_model and not args.resume:
        from centerpose_tpu.utils.checkpoint import load_partial

        p_, bs_, n_ok, n_skip = load_partial(
            args.load_model, state.params, state.batch_stats
        )
        state = state.replace(params=p_, batch_stats=bs_)
        logger.write(
            f"partial-init from {args.load_model}: {n_ok} tensors loaded, "
            f"{n_skip} kept at init"
        )
    if args.resume:
        state, step = load_checkpoint(ckpt_dir, state)
        start_epoch = step // steps_per_epoch
        logger.write(f"resumed from step {step} (epoch {start_epoch})")

    n_dev = args.num_devices or len(jax.devices())
    mesh = make_mesh(n_dev)
    step_fn = make_train_step(cfg, model, tx, mesh=mesh)
    eval_fn = make_eval_step(cfg, model)
    state = replicate(mesh, state)

    # Parallel prefetching loader (DataLoader(num_workers) parity,
    # main_CenterPose.py:70-78): host augmentation overlaps the device step.
    train_loader = DataLoader(
        train_ds, cfg.batch_size, shuffle=True, num_workers=args.num_workers,
        seed=args.seed, mode=args.loader_mode, drop_last=True,
    )
    val_loader = DataLoader(
        val_ds, cfg.batch_size, shuffle=False, num_workers=args.num_workers,
        seed=args.seed, mode=args.loader_mode, drop_last=False,
    )

    debug_fwd = None
    if args.debug > 0:
        from centerpose_tpu.training.debug import render_train_debug, save_train_debug

        @jax.jit
        def debug_fwd(variables, batch):
            from centerpose_tpu.training.trainer import decode_wire

            batch = decode_wire(batch)
            kwargs = {}
            if cfg.tracking_task:
                kwargs = dict(
                    pre_img=batch.get("pre_img"),
                    pre_hm=batch.get("pre_hm"),
                    pre_hm_hp=batch.get("pre_hm_hp"),
                )
            return model.apply(variables, batch["input"], train=False, **kwargs)

    best = float("inf")
    for epoch in range(start_epoch + 1, cfg.num_epochs + 1):
        t0 = time.time()
        agg = {}
        n_steps = 0
        train_loader.set_epoch(epoch)
        for batch in train_loader:
            if debug_fwd is not None and n_steps == 0:
                variables = {"params": state.params, "batch_stats": state.batch_stats}
                outputs = debug_fwd(variables, batch)
                from centerpose_tpu.training.trainer import decode_wire_np

                imgs = render_train_debug(decode_wire_np(batch), outputs, cfg)
                save_train_debug(imgs, os.path.join(exp_dir, "debug"), f"e{epoch}_")
                for name_, img_ in imgs.items():
                    logger.image(epoch, f"debug/{name_}", img_)
                logger.write(f"debug canvases saved: {sorted(imgs)}")
            batch = shard_batch(mesh, batch)
            state, stats = step_fn(state, batch)
            n_steps += 1
            stats = jax.device_get(stats)  # ONE fetch, not one RTT per scalar
            for k, v in stats.items():
                agg[k] = agg.get(k, 0.0) + float(v)
        agg = {k: v / max(n_steps, 1) for k, v in agg.items()}
        logger.scalars(epoch, agg, prefix="train_")
        logger.write(
            f"epoch {epoch}: " + " ".join(f"{k}={v:.4f}" for k, v in agg.items())
            + f" ({time.time()-t0:.1f}s)"
        )

        if args.val_intervals > 0 and epoch % args.val_intervals == 0:
            vagg, vn = {}, 0
            for batch in val_loader:
                stats = eval_fn(state, {k: np.asarray(v) for k, v in batch.items()})
                vn += 1
                for k, v in stats.items():
                    vagg[k] = vagg.get(k, 0.0) + float(v)
            vagg = {k: v / max(vn, 1) for k, v in vagg.items()}
            logger.scalars(epoch, vagg, prefix="val_")
            logger.write(f"val {epoch}: " + " ".join(f"{k}={v:.4f}" for k, v in vagg.items()))
            if vagg.get("loss", float("inf")) < best:
                best = vagg["loss"]
                save_checkpoint(os.path.join(exp_dir, "best"), state, int(state.step))

        save_checkpoint(ckpt_dir, state, int(state.step))
        if args.save_intervals > 0 and epoch % args.save_intervals == 0:
            save_checkpoint(
                os.path.join(exp_dir, f"epoch_{epoch}"), state, int(state.step)
            )

    logger.write("training done")


if __name__ == "__main__":
    main()
