"""CLI smoke tests: demo.py and evaluate.py end-to-end via subprocess."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def toy_data(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("toy")
    vid = root / "video_0"
    vid.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(vid / f"{i:05d}.png")
        kps9 = [[64, 48]] + [
            [64 + dx, 48 + dy] for dx in (-20, 20) for dy in (-15, 15)
        ] * 2
        ann = {
            "camera_data": {
                "width": 128, "height": 96,
                "intrinsics": {"fx": 120.0, "fy": 120.0, "cx": 64.0, "cy": 48.0},
            },
            "objects": [
                {
                    "name": "shoe_0",
                    "location": [0.0, 0.0, 1.0],
                    "quaternion_xyzw": [0, 0, 0, 1],
                    "projected_cuboid": kps9[:9],
                    "scale": [0.1, 0.1, 0.25],
                    "keypoints_3d": np.zeros((9, 3)).tolist(),
                }
            ],
            "AR_data": {"plane_center": [0, -0.05, 1], "plane_normal": [0, 1, 0]},
        }
        with open(vid / f"{i:05d}.json", "w") as f:
            json.dump(ann, f)
    return str(root)


def _run(args, cwd="/root/repo", timeout=1200):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env, capture_output=True,
        text=True, timeout=timeout,
    )
    return proc


# Note: the image sitecustomize pins jax to the axon TPU plugin via PYTHONPATH;
# stripping PYTHONPATH + JAX_PLATFORMS=cpu gives a hermetic CPU run.
class TestDemoCLI:
    def test_demo_single_image(self, toy_data, tmp_path):
        img = os.path.join(toy_data, "video_0", "00000.png")
        out_dir = str(tmp_path / "demo_out")
        proc = _run(
            ["demo.py", "--demo", img, "--c", "shoe", "--arch", "dlav1_34",
             "--out_dir", out_dir, "--debug", "2"],
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        outs = os.listdir(out_dir)
        assert any(f.endswith(".json") for f in outs)
        with open(os.path.join(out_dir, "00000.json")) as f:
            rec = json.load(f)
        assert "detections" in rec
        # --debug 2 emits the reference's canvas set (object_pose.py:199-313).
        dbg_files = os.listdir(os.path.join(out_dir, "debug"))
        for canvas in ("out_hm_pred", "out_hmhp_pred", "out_kps_processed_pred",
                       "out_img_pred"):
            assert any(canvas in f for f in dbg_files), (canvas, dbg_files)


class TestEvaluateCLI:
    def test_metric_eval_runs(self, toy_data, tmp_path):
        report = str(tmp_path / "report.txt")
        proc = _run(
            ["evaluate.py", "--mode", "metric", "--data_dir", toy_data,
             "--c", "shoe", "--max_images", "2", "--report_file", report],
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert os.path.exists(report)
        text = open(report).read()
        assert "iou3d" in text and "num_gt=2" in text
