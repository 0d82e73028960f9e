"""Debug rendering tests: Debugger canvases, train-time pred/GT blends,
detector-side canvas set (debugger.py / trains/object_pose.py:218-401 parity)."""

import numpy as np
import pytest

from centerpose_tpu.config import preset
from centerpose_tpu.utils.debugger import Debugger


class TestDebuggerPrimitives:
    def test_blend_upsamples_and_mixes(self):
        dbg = Debugger()
        back = np.full((64, 64, 3), 200, np.uint8)
        fore = np.zeros((16, 16, 3), np.float32)
        dbg.add_blend_img(back, fore, "blend", trans=0.5)
        assert dbg.imgs["blend"].shape == (64, 64, 3)
        assert abs(int(dbg.imgs["blend"][0, 0, 0]) - 100) <= 1

    def test_gen_colormap_hp_uses_joint_colors(self):
        dbg = Debugger()
        hm = np.zeros((16, 16, 8), np.float32)
        hm[8, 8, 3] = 1.0  # joint 3 -> green (0, 128, 0)
        cmap = dbg.gen_colormap_hp(hm, (16, 16))
        assert tuple(cmap[8, 8].astype(int)) == (0, 128, 0)

    def test_coco_hp_skips_sentinel_points(self):
        dbg = Debugger()
        dbg.add_img(np.zeros((64, 64, 3), np.uint8), "c")
        pts = np.full((8, 2), -10000.0)
        before = dbg.imgs["c"].copy()
        dbg.add_coco_hp(pts, img_id="c")
        np.testing.assert_array_equal(dbg.imgs["c"], before)  # nothing drawn

    def test_coco_hp_draws_cuboid(self):
        dbg = Debugger()
        dbg.add_img(np.zeros((64, 64, 3), np.uint8), "c")
        pts = np.array(
            [[10, 10], [10, 40], [40, 10], [40, 40],
             [20, 20], [20, 50], [50, 20], [50, 50]], np.float64
        )
        dbg.add_coco_hp(pts, img_id="c", pred_flag="gt")
        assert dbg.imgs["c"].any()

    def test_obj_scale_text_and_arrow(self):
        dbg = Debugger()
        dbg.add_img(np.zeros((64, 96, 3), np.uint8), "c")
        dbg.add_obj_scale([5, 5, 60, 60], [0.5, 1.0, 0.25], img_id="c")
        dbg.add_arrow([30, 30], [10, 5], "c")
        assert dbg.imgs["c"].any()

    def test_add_axes(self):
        dbg = Debugger()
        dbg.add_img(np.zeros((96, 128, 3), np.uint8), "c")
        box = np.array(
            [[0, 0, 1]]
            + [[x, y, 1 + z] for x in (-0.1, 0.1) for y in (-0.1, 0.1)
               for z in (-0.1, 0.1)],
            np.float64,
        )
        cam = np.array([[120.0, 0, 64], [0, 120.0, 48], [0, 0, 1]])
        dbg.add_axes(box, cam, img_id="c")
        assert dbg.imgs["c"].any()

    def test_save_all_imgs(self, tmp_path):
        dbg = Debugger()
        dbg.add_img(np.zeros((8, 8, 3), np.uint8), "a")
        dbg.add_img(np.ones((8, 8, 3), np.uint8), "b")
        dbg.save_all_imgs(str(tmp_path), prefix="x_")
        names = sorted(p.name for p in tmp_path.iterdir())
        assert names == ["x_a.png", "x_b.png"]


class TestTrainDebug:
    @pytest.fixture(scope="class")
    def rendered(self):
        import jax

        from centerpose_tpu.data.targets import (
            ObjectAnnotation, render_targets, stack_batch,
        )
        from centerpose_tpu.models import create_model
        from centerpose_tpu.training.debug import render_train_debug

        cfg = preset("centerpose", input_h=64, input_w=64, K=8, batch_size=2)
        model = create_model(cfg)
        rng = np.random.RandomState(0)
        x = rng.randn(2, 64, 64, 3).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), x[:1])
        outputs = model.apply(variables, x, train=False)

        samples = []
        for _ in range(2):
            obj = ObjectAnnotation(
                center=np.array([8.0, 8.0]),
                size=np.array([8.0, 8.0]),
                keypoints=rng.uniform(2, 14, size=(1, 8, 2)).astype(np.float32),
                keypoints_visible=np.ones((1, 8), bool),
                scale_3d=np.array([1.0, 1.0, 1.0], np.float32),
            )
            samples.append(render_targets([obj], cfg))
        batch = stack_batch(samples)
        batch["input"] = x
        return render_train_debug(batch, outputs, cfg, center_thresh=-1.0)

    def test_canvas_set(self, rendered):
        for canvas in ("out_hm_pred", "out_hm_gt", "out_hmhp_pred", "out_hmhp_gt",
                       "out_img_pred", "out_img_gt", "out_pred_gt_blend"):
            assert canvas in rendered, sorted(rendered)

    def test_canvases_are_input_res_rgb(self, rendered):
        for img in rendered.values():
            assert img.shape == (64, 64, 3)
            assert img.dtype == np.uint8

    def test_gt_canvas_differs_from_plain_image(self, rendered):
        # GT wireframes must actually be drawn.
        assert (rendered["out_img_gt"] != rendered["out_hm_gt"]).any()

    def test_save(self, rendered, tmp_path):
        from centerpose_tpu.training.debug import save_train_debug

        save_train_debug(rendered, str(tmp_path), "e1_")
        assert any(p.name.startswith("e1_") for p in tmp_path.iterdir())


class TestDetectorDebug:
    def test_render_debug_canvases(self):
        from centerpose_tpu.inference.detector import Detector

        cfg = preset("centerpose", input_h=64, input_w=64, K=8, vis_thresh=0.0)
        det = Detector(cfg)
        det.debug_level = 2
        rng = np.random.RandomState(0)
        img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        out = det.run(img)
        dbg = det.render_debug(img, out)
        for canvas in ("out_hm_pred", "out_hmhp_pred", "out_kps_processed_pred",
                       "out_img_pred"):
            assert canvas in dbg.imgs, sorted(dbg.imgs)
        assert dbg.imgs["out_img_pred"].shape == (96, 128, 3)
