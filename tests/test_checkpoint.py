"""Orbax checkpoint save/load round-trips + train.py CLI smoke test."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from centerpose_tpu.config import preset
from centerpose_tpu.models import create_model
from centerpose_tpu.training.trainer import create_train_state
from centerpose_tpu.utils.checkpoint import (
    latest_step,
    load_checkpoint,
    save_checkpoint,
)


class TestCheckpoint:
    @pytest.fixture(scope="class")
    def state_and_model(self):
        cfg = preset("centerpose", input_h=64, input_w=64)
        model = create_model(cfg)
        state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))
        return state

    def test_save_load_roundtrip(self, state_and_model, tmp_path):
        state = state_and_model
        d = str(tmp_path / "ckpt")
        save_checkpoint(d, state, step=7)
        restored, step = load_checkpoint(d, state)
        assert step == 7
        orig = jax.tree_util.tree_leaves(state.params)
        rest = jax.tree_util.tree_leaves(restored.params)
        for a, b in zip(orig, rest):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_latest_step(self, state_and_model, tmp_path):
        d = str(tmp_path / "ckpt2")
        assert latest_step(d) is None
        save_checkpoint(d, state_and_model, step=3)
        save_checkpoint(d, state_and_model, step=9)
        assert latest_step(d) == 9

    def test_missing_checkpoint_raises(self, state_and_model, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_checkpoint(str(tmp_path / "nope"), state_and_model)


class TestTrainCLI:
    def test_one_epoch_toy_training(self, tmp_path):
        # Build a 4-frame toy dataset.
        import json

        from PIL import Image

        data = tmp_path / "data" / "video_0"
        data.mkdir(parents=True)
        rng = np.random.RandomState(0)
        for i in range(4):
            Image.fromarray((rng.rand(96, 128, 3) * 255).astype(np.uint8)).save(
                data / f"{i:05d}.png"
            )
            kps9 = [[64, 48]] + [
                [64 + dx, 48 + dy] for dx in (-20, 20) for dy in (-15, 15)
            ] * 2
            with open(data / f"{i:05d}.json", "w") as f:
                json.dump(
                    {
                        "camera_data": {"width": 128, "height": 96},
                        "objects": [
                            {
                                "name": "shoe_0",
                                "location": [0, 0, 1],
                                "quaternion_xyzw": [0, 0, 0, 1],
                                "projected_cuboid": kps9[:9],
                                "scale": [0.1, 0.1, 0.25],
                                "keypoints_3d": np.zeros((9, 3)).tolist(),
                            }
                        ],
                    },
                    f,
                )

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PYTHONPATH", None)
        proc = subprocess.run(
            [
                sys.executable, "train.py",
                "--data_dir", str(tmp_path / "data"),
                "--c", "shoe", "--arch", "dlav1_34",
                "--batch_size", "2", "--num_epochs", "1",
                "--input_res", "64", "--num_devices", "2",
                "--val_intervals", "1", "--exp_id", "toytest",
            ],
            cwd="/root/repo", env=env, capture_output=True, text=True,
            timeout=1500,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        exp = "/root/repo/exp/dlav1_34/toytest"
        assert os.path.exists(os.path.join(exp, "log.txt"))
        log = open(os.path.join(exp, "log.txt")).read()
        assert "epoch 1" in log
        assert os.path.isdir(os.path.join(exp, "ckpt"))
        import shutil

        # Scope the cleanup to THIS test's exp_id — a bare rmtree of exp/
        # deletes live training runs and datasets sharing the repo
        # (it killed a 1.5h chip run in round 5).
        shutil.rmtree(exp, ignore_errors=True)
