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

    def test_hard_case_subsets(self, toy_data, tmp_path):
        """--eval_hard_case 1 (json id file) and 2 (inline list) restrict the
        evaluated videos (eval_video_official.py:1574-1603)."""
        cases = str(tmp_path / "hard_cases.json")
        with open(cases, "w") as f:
            json.dump({"shoe": ["video_0"]}, f)
        report = str(tmp_path / "r1.txt")
        proc = _run(
            ["evaluate.py", "--mode", "metric", "--data_dir", toy_data,
             "--c", "shoe", "--input_res", "64", "--report_file", report,
             "--eval_hard_case", "1", "--eval_hard_case_file", cases],
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "num_gt=2" in open(report).read()

        # An id list that matches nothing -> zero GT evaluated.
        report2 = str(tmp_path / "r2.txt")
        proc = _run(
            ["evaluate.py", "--mode", "metric", "--data_dir", toy_data,
             "--c", "shoe", "--input_res", "64", "--report_file", report2,
             "--eval_hard_case", "2", "--eval_hard_case_list", "no_such_video"],
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "num_gt=0" in open(report2).read()

    def test_n_proc_tfrecord_shards(self, tmp_path):
        """--n_proc 2: per-video shard workers + raw-stats merge
        (eval_video_official.py:1639-1675 parity)."""
        import io

        from PIL import Image

        import sys as _sys

        _sys.path.insert(0, "/root/repo")
        from centerpose_tpu.data.tfrecord import write_tfrecord
        from tests.test_tfrecord import make_example

        rng = np.random.RandomState(0)
        img = Image.fromarray((rng.rand(48, 64, 3) * 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        for vid in ("video_a", "video_b"):
            pts2d = np.hstack([rng.rand(9, 2), np.ones((9, 1))])
            payload = make_example(
                {
                    "image/encoded": ("bytes", [buf.getvalue()]),
                    "image/id": ("int64", [0]),
                    "image/filename": ("bytes", [f"shoe/{vid}/0".encode()]),
                    "instance_num": ("int64", [1]),
                    "point_num": ("int64", [9]),
                    "point_2d": ("float", pts2d.ravel().tolist()),
                    "point_3d": ("float", rng.rand(9, 3).ravel().tolist()),
                    "object/scale": ("float", [0.1, 0.2, 0.15]),
                    "object/translation": ("float", [0, 0, 1.0]),
                    "object/orientation": ("float", np.eye(3).ravel().tolist()),
                    "object/visibility": ("float", [1.0]),
                }
            )
            write_tfrecord(str(tmp_path / f"{vid}.tfrecord"), [payload])

        report = str(tmp_path / "nproc.txt")
        proc = _run(
            ["evaluate.py", "--mode", "metric",
             "--tfrecords", str(tmp_path / "*.tfrecord"),
             "--c", "shoe", "--input_res", "64", "--n_proc", "2",
             "--report_file", report],
            timeout=2400,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "num_gt=2" in open(report).read()

    def test_eval_continue_skips_done_videos(self, tmp_path):
        """--eval_continue (eval_video_official.py:1599-1602 parity): a run
        killed after the first video leaves <stats_save>/<video>.json behind;
        the restart skips it, evaluates the rest, and reports the union."""
        from PIL import Image

        root = tmp_path / "data"
        rng = np.random.RandomState(0)
        for vid in ("video_0", "video_1"):
            d = root / vid
            d.mkdir(parents=True)
            for i in range(2):
                img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
                Image.fromarray(img).save(d / f"{i:05d}.png")
                kps9 = [[64, 48]] + [
                    [64 + dx, 48 + dy] for dx in (-20, 20) for dy in (-15, 15)
                ] * 2
                ann = {
                    "camera_data": {
                        "width": 128, "height": 96,
                        "intrinsics": {"fx": 120.0, "fy": 120.0,
                                       "cx": 64.0, "cy": 48.0},
                    },
                    "objects": [{
                        "name": "shoe_0",
                        "location": [0.0, 0.0, 1.0],
                        "quaternion_xyzw": [0, 0, 0, 1],
                        "projected_cuboid": kps9[:9],
                        "scale": [0.1, 0.1, 0.25],
                        "keypoints_3d": np.zeros((9, 3)).tolist(),
                    }],
                }
                with open(d / f"{i:05d}.json", "w") as f:
                    json.dump(ann, f)
        stats = str(tmp_path / "stats")
        # "First run, killed after video_0": evaluate only video_0.
        proc = _run(
            ["evaluate.py", "--mode", "metric", "--data_dir", str(root),
             "--c", "shoe", "--input_res", "64", "--eval_continue",
             "--stats_save", stats,
             "--eval_hard_case", "2", "--eval_hard_case_list", "video_0"],
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert os.path.exists(os.path.join(stats, "video_0.json"))
        assert not os.path.exists(os.path.join(stats, "video_1.json"))
        # Restart over BOTH videos: video_0 skipped, video_1 evaluated.
        report = str(tmp_path / "resumed.txt")
        proc = _run(
            ["evaluate.py", "--mode", "metric", "--data_dir", str(root),
             "--c", "shoe", "--input_res", "64", "--eval_continue",
             "--stats_save", stats, "--report_file", report],
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "skipping video_0" in proc.stdout
        assert "skipping video_1" not in proc.stdout
        assert os.path.exists(os.path.join(stats, "video_1.json"))
        assert "num_gt=4" in open(report).read()
        # Third run: everything skipped, identical counts from merged stats.
        report2 = str(tmp_path / "all_skipped.txt")
        proc = _run(
            ["evaluate.py", "--mode", "metric", "--data_dir", str(root),
             "--c", "shoe", "--input_res", "64", "--eval_continue",
             "--stats_save", stats, "--report_file", report2],
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "skipping video_0" in proc.stdout
        assert "skipping video_1" in proc.stdout
        assert "num_gt=4" in open(report2).read()

    def test_eval_continue_composes_with_n_proc(self, tmp_path):
        """--eval_continue --n_proc 2 (VERDICT r4 weak #5): a 4-video sweep
        "killed" after two videos (first run restricted via --eval_hard_case)
        resumes under a 2-proc pool — done videos are skipped, pending ones
        are sharded over spawn workers, and the report is the union
        (eval_video_official.py:1599-1602 + :1639-1675)."""
        from PIL import Image

        root = tmp_path / "data"
        rng = np.random.RandomState(0)
        vids = [f"video_{i}" for i in range(4)]
        for vid in vids:
            d = root / vid
            d.mkdir(parents=True)
            img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(d / "00000.png")
            kps9 = [[64, 48]] + [
                [64 + dx, 48 + dy] for dx in (-20, 20) for dy in (-15, 15)
            ] * 2
            ann = {
                "camera_data": {
                    "width": 128, "height": 96,
                    "intrinsics": {"fx": 120.0, "fy": 120.0,
                                   "cx": 64.0, "cy": 48.0},
                },
                "objects": [{
                    "name": "shoe_0",
                    "location": [0.0, 0.0, 1.0],
                    "quaternion_xyzw": [0, 0, 0, 1],
                    "projected_cuboid": kps9[:9],
                    "scale": [0.1, 0.1, 0.25],
                    "keypoints_3d": np.zeros((9, 3)).tolist(),
                }],
            }
            with open(d / "00000.json", "w") as f:
                json.dump(ann, f)
        stats = str(tmp_path / "stats")
        # "First run, killed mid-sweep": 2-proc pool over the first 2 videos.
        proc = _run(
            ["evaluate.py", "--mode", "metric", "--data_dir", str(root),
             "--c", "shoe", "--input_res", "64", "--eval_continue",
             "--stats_save", stats, "--n_proc", "2",
             "--eval_hard_case", "2", "--eval_hard_case_list",
             "video_0", "video_1"],
            timeout=2400,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        for vid in ("video_0", "video_1"):
            assert os.path.exists(os.path.join(stats, f"{vid}.json"))
        assert not os.path.exists(os.path.join(stats, "video_2.json"))
        # Resume over ALL 4 videos, still 2-proc: done ones skipped in the
        # parent, pending ones evaluated in the pool.
        report = str(tmp_path / "resumed.txt")
        proc = _run(
            ["evaluate.py", "--mode", "metric", "--data_dir", str(root),
             "--c", "shoe", "--input_res", "64", "--eval_continue",
             "--stats_save", stats, "--n_proc", "2",
             "--report_file", report],
            timeout=2400,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "skipping video_0" in proc.stdout
        assert "skipping video_1" in proc.stdout
        assert "skipping video_2" not in proc.stdout
        for vid in vids:
            assert os.path.exists(os.path.join(stats, f"{vid}.json"))
        assert "num_gt=4" in open(report).read()

    def test_all_checkpoints_loss_replay(self, toy_data, tmp_path):
        """--mode loss --all_checkpoints replays every checkpoint dir through
        the val loss (src/test.py:70-95 parity)."""
        import jax

        import sys as _sys

        _sys.path.insert(0, "/root/repo")
        from centerpose_tpu.config import preset
        from centerpose_tpu.models import create_model
        from centerpose_tpu.training.trainer import create_train_state
        from centerpose_tpu.utils.checkpoint import save_checkpoint

        cfg = preset("centerpose", category="shoe", input_h=64, input_w=64)
        model = create_model(cfg)
        state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))
        for epoch in (1, 2):
            save_checkpoint(
                str(tmp_path / "ckpts" / f"epoch_{epoch}"), state, step=epoch
            )

        proc = _run(
            ["evaluate.py", "--mode", "loss", "--data_dir", toy_data,
             "--c", "shoe", "--input_res", "64", "--all_checkpoints",
             "--load_model", str(tmp_path / "ckpts")],
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "epoch_1 (step 1)" in proc.stdout, proc.stdout
        assert "epoch_2 (step 2)" in proc.stdout, proc.stdout
        assert "loss=" in proc.stdout  # tail partial batch is evaluated


class TestDemoFixShort:
    def test_demo_fix_short(self, toy_data, tmp_path):
        """--fix_short resizes the short side, long side rounded to 64
        (base_detector.py:96-104)."""
        img = os.path.join(toy_data, "video_0", "00000.png")
        out_dir = str(tmp_path / "fs_out")
        proc = _run(
            ["demo.py", "--demo", img, "--c", "shoe", "--arch", "dlav1_34",
             "--fix_short", "64", "--out_dir", out_dir],
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        with open(os.path.join(out_dir, "00000.json")) as f:
            rec = json.load(f)
        assert "detections" in rec
