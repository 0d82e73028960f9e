"""Training-step + multi-chip sharding tests (8 virtual CPU devices, see conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centerpose_tpu.config import preset
from centerpose_tpu.data.targets import ObjectAnnotation, render_targets, stack_batch
from centerpose_tpu.models import create_model
from centerpose_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from centerpose_tpu.training.trainer import (
    create_train_state,
    make_optimizer,
    make_train_step,
)


def _tiny_batch(cfg, n):
    rng = np.random.RandomState(0)
    samples = []
    for _ in range(n):
        obj = ObjectAnnotation(
            center=np.array([8.0, 8.0]),
            size=np.array([6.0, 6.0]),
            keypoints=rng.uniform(4, 12, size=(cfg.num_symmetry, 8, 2)).astype(
                np.float32
            ),
            keypoints_visible=np.ones((cfg.num_symmetry, 8), bool),
            scale_3d=np.array([1.0, 1.0, 1.0], np.float32),
        )
        samples.append(render_targets([obj], cfg))
    batch = stack_batch(samples)
    batch["input"] = rng.randn(n, cfg.input_h, cfg.input_w, 3).astype(np.float32)
    return batch


class TestTargets:
    def test_target_shapes(self):
        cfg = preset("centerpose", input_h=64, input_w=64)
        batch = _tiny_batch(cfg, 2)
        assert batch["hm"].shape == (2, 1, 16, 16, 1)
        assert batch["hm_hp"].shape == (2, 1, 16, 16, 8)
        assert batch["ind"].shape == (2, 1, cfg.max_objs)
        assert batch["hps"].shape == (2, 1, cfg.max_objs, 16)
        assert batch["hp_ind"].shape == (2, 1, 8 * cfg.max_objs)

    def test_center_gaussian_peak(self):
        cfg = preset("centerpose", input_h=64, input_w=64)
        batch = _tiny_batch(cfg, 1)
        assert batch["hm"][0, 0, 8, 8, 0] == pytest.approx(1.0)
        assert batch["ind"][0, 0, 0] == 8 * 16 + 8
        assert batch["reg_mask"][0, 0, 0] == 1.0

    def test_displacements_are_center_relative(self):
        cfg = preset("centerpose", input_h=64, input_w=64)
        rng = np.random.RandomState(3)
        kp = rng.uniform(4, 12, size=(1, 8, 2)).astype(np.float32)
        obj = ObjectAnnotation(
            center=np.array([8.0, 8.0]),
            size=np.array([6.0, 6.0]),
            keypoints=kp,
            keypoints_visible=np.ones((1, 8), bool),
            scale_3d=np.ones(3, np.float32),
        )
        t = render_targets([obj], cfg)
        np.testing.assert_allclose(
            t["hps"][0, 0].reshape(8, 2), kp[0] - np.array([8, 8]), atol=1e-5
        )


class TestTrainStep:
    def test_single_device_step_decreases_loss(self):
        cfg = preset("centerpose", input_h=64, input_w=64)
        model = create_model(cfg)
        state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0))
        step = make_train_step(cfg, model, tx)
        batch = {k: jnp.asarray(v) for k, v in _tiny_batch(cfg, 2).items()}
        losses = []
        for _ in range(3):
            state, stats = step(state, batch)
            losses.append(float(stats["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]

    def test_multichip_mesh_step(self):
        n = len(jax.devices())
        assert n == 8, f"conftest should provide 8 virtual devices, got {n}"
        cfg = preset("centerpose", input_h=64, input_w=64)
        model = create_model(cfg)
        state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0))
        mesh = make_mesh(n)
        step = make_train_step(cfg, model, tx, mesh=mesh)
        batch = shard_batch(mesh, _tiny_batch(cfg, n))
        state = replicate(mesh, state)
        state, stats = step(state, batch)
        assert np.isfinite(float(stats["loss"]))
        assert int(state.step) == 1

    def test_lr_schedule_steps_down(self):
        cfg = preset("centerpose")
        tx = make_optimizer(cfg, steps_per_epoch=10)
        # The optax chain exists and produces updates with the right structure.
        params = {"w": jnp.ones((3,))}
        opt_state = tx.init(params)
        grads = {"w": jnp.ones((3,))}
        updates, _ = tx.update(grads, opt_state, params)
        assert updates["w"].shape == (3,)


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)
