"""Sharded training step (the reference's BaseTrainer/ModelWithLoss, TPU-native).

Parity targets: `ModelWithLoss`+`run_epoch` (src/lib/trains/base_trainer.py:17-143 —
forward+loss in one program, grad-clip 100, Adam) and the epoch driver defaults of
main_CenterPose.py:25-191 (LR ÷10 at lr_step epochs).

TPU design: the train step is ONE jitted program over a 1-D `data` mesh — batch
sharded on axis 0, params replicated, gradient psum inserted by XLA (replacing the
reference's DataParallel scatter/gather, SURVEY §2.2). BatchNorm statistics are
per-call batch-averaged (flax) — the reference's DataParallel likewise never
synchronized BN across GPUs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from centerpose_tpu.config import DATA_MEAN, DATA_STD, CenterPoseConfig
from centerpose_tpu.training.losses import CenterPoseLossConfig, centerpose_loss


def decode_wire(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Undo the loader's compact wire encoding ON DEVICE (ObjectPoseDataset
    compact_wire=True): uint8 images -> mean/std-normalized f32, uint8 [0,1]
    heatmaps -> f32/255. A no-op on f32 batches — the dtype checks are
    trace-time, so the f32 path compiles to an identity."""
    out = dict(batch)
    mean = jnp.asarray(DATA_MEAN, jnp.float32)
    std = jnp.asarray(DATA_STD, jnp.float32)
    for k in ("input", "pre_img"):
        v = out.get(k)
        if v is not None and v.dtype == jnp.uint8:
            out[k] = (v.astype(jnp.float32) / 255.0 - mean) / std
    for k in ("hm", "hm_hp", "pre_hm", "pre_hm_hp"):
        v = out.get(k)
        if v is not None and v.dtype == jnp.uint8:
            out[k] = v.astype(jnp.float32) / 255.0
    return out


def decode_wire_np(batch):
    """Host-side twin of `decode_wire` (numpy) for debug renderers."""
    import numpy as np

    out = dict(batch)
    mean = np.array(DATA_MEAN, np.float32)
    std = np.array(DATA_STD, np.float32)
    for k in ("input", "pre_img"):
        v = out.get(k)
        if v is not None and np.asarray(v).dtype == np.uint8:
            out[k] = (np.asarray(v, np.float32) / 255.0 - mean) / std
    for k in ("hm", "hm_hp", "pre_hm", "pre_hm_hp"):
        v = out.get(k)
        if v is not None and np.asarray(v).dtype == np.uint8:
            out[k] = np.asarray(v, np.float32) / 255.0
    return out


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(cfg: CenterPoseConfig):
    """Piecewise step decay: LR ÷10 at each lr_step epoch boundary, expressed in
    steps via steps_per_epoch when building the optimizer."""

    def schedule(steps_per_epoch: int):
        boundaries = {
            int(e) * steps_per_epoch: 0.1 for e in cfg.lr_step
        }
        return optax.piecewise_constant_schedule(cfg.lr, boundaries)

    return schedule


def make_optimizer(cfg: CenterPoseConfig, steps_per_epoch: int = 1000):
    lr = make_lr_schedule(cfg)(steps_per_epoch)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),  # base_trainer.py:94-97
        optax.adam(lr),
    )


def create_train_state(
    cfg: CenterPoseConfig, model, rng, steps_per_epoch: int = 1000
) -> Tuple[TrainState, Any]:
    dummy = jnp.zeros((1, cfg.input_h, cfg.input_w, 3), jnp.float32)
    kwargs = {}
    if cfg.tracking_task:
        kwargs = dict(
            pre_img=dummy,
            pre_hm=jnp.zeros((1, cfg.input_h, cfg.input_w, 1)),
            pre_hm_hp=jnp.zeros((1, cfg.input_h, cfg.input_w, 8)),
        )
    variables = model.init(rng, dummy, train=False, **kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg, steps_per_epoch)
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
        ),
        tx,
    )


def loss_config_from(cfg: CenterPoseConfig) -> CenterPoseLossConfig:
    return CenterPoseLossConfig(
        hm_weight=cfg.hm_weight,
        wh_weight=cfg.wh_weight,
        off_weight=cfg.off_weight,
        hp_weight=cfg.hp_weight,
        hm_hp_weight=cfg.hm_hp_weight,
        obj_scale_weight=cfg.obj_scale_weight,
        tracking_weight=cfg.tracking_weight,
        tracking_hp_weight=cfg.tracking_hp_weight,
        hps_uncertainty=cfg.hps_uncertainty,
        obj_scale_uncertainty=cfg.obj_scale_uncertainty,
        kl_scale_uncertainty=cfg.kl_scale_uncertainty,
        kl_kps_uncertainty=cfg.kl_kps_uncertainty,
        dimension_ref=cfg.dimension_ref,
    )


def make_train_step(cfg: CenterPoseConfig, model, tx, mesh: Optional[Mesh] = None):
    """Build the jitted train step. With a mesh: batch sharded over `data`,
    state replicated; XLA inserts the gradient all-reduce over ICI."""
    loss_cfg = loss_config_from(cfg)

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        batch = decode_wire(batch)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            kwargs = {}
            if cfg.tracking_task:
                kwargs = dict(
                    pre_img=batch.get("pre_img"),
                    pre_hm=batch.get("pre_hm"),
                    pre_hm_hp=batch.get("pre_hm_hp"),
                )
            outputs, mutated = model.apply(
                variables,
                batch["input"],
                train=True,
                mutable=["batch_stats"],
                **kwargs,
            )
            loss, stats, _ = centerpose_loss(outputs, batch, loss_cfg, "train")
            return loss, (stats, mutated["batch_stats"])

        (loss, (stats, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, stats

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_eval_step(cfg: CenterPoseConfig, model):
    """Validation loss step (test.py / trainer.val parity): running BN stats,
    val-phase loss (relative scale error — trains/object_pose.py:125-128)."""
    loss_cfg = loss_config_from(cfg)

    @jax.jit
    def eval_fn(state: TrainState, batch):
        batch = decode_wire(batch)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        kwargs = {}
        if cfg.tracking_task:
            kwargs = dict(
                pre_img=batch.get("pre_img"),
                pre_hm=batch.get("pre_hm"),
                pre_hm_hp=batch.get("pre_hm_hp"),
            )
        outputs = model.apply(variables, batch["input"], train=False, **kwargs)
        _, stats, _ = centerpose_loss(outputs, batch, loss_cfg, "val")
        return stats

    return eval_fn
