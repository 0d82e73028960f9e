"""End-to-end pipeline tests on tiny inputs (64x64) — slow-ish on CPU, kept minimal."""

import numpy as np
import pytest

import jax

from centerpose_tpu.config import preset
from centerpose_tpu.inference.detector import Detector
from centerpose_tpu.inference.nms import soft_nms


class TestSoftNMS:
    def test_keeps_distinct_boxes(self):
        boxes = np.array([[0, 0, 10, 10], [100, 100, 120, 120]], np.float64)
        scores = np.array([0.9, 0.8])
        keep = soft_nms(boxes, scores, threshold=0.3)
        assert set(keep.tolist()) == {0, 1}

    def test_suppresses_duplicate(self):
        boxes = np.array([[0, 0, 10, 10], [0.5, 0.5, 10.5, 10.5]], np.float64)
        scores = np.array([0.9, 0.8])
        keep = soft_nms(boxes, scores, nt=0.5, method=2, threshold=0.5)
        assert keep.tolist() == [0]

    def test_greedy_order_by_score(self):
        boxes = np.array(
            [[0, 0, 10, 10], [50, 50, 60, 60], [100, 100, 110, 110]], np.float64
        )
        scores = np.array([0.5, 0.9, 0.7])
        keep = soft_nms(boxes, scores, threshold=0.1)
        assert keep.tolist() == [1, 2, 0]

    def test_hard_nms_method0(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float64)
        scores = np.array([0.9, 0.8])
        keep = soft_nms(boxes, scores, nt=0.3, method=0, threshold=0.01)
        assert keep.tolist() == [0]


class TestDetectorE2E:
    @pytest.fixture(scope="class")
    def detector(self):
        cfg = preset(
            "centerpose", input_h=64, input_w=64, K=8, category="shoe",
            vis_thresh=0.0,
        )
        return Detector(cfg)

    def test_run_returns_structure(self, detector):
        rng = np.random.RandomState(0)
        img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        out = detector.run(img)
        assert set(out) >= {"results", "boxes", "meta", "times"}
        for stage in ("pre", "net", "dec", "post", "merge", "pnp", "track", "tot"):
            assert stage in out["times"]

    def test_results_have_reference_fields(self, detector):
        rng = np.random.RandomState(1)
        img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        out = detector.run(img)
        if out["results"]:
            det = out["results"][0]
            for field in (
                "score", "cls", "bbox", "ct", "kps", "obj_scale",
                "kps_displacement_mean", "kps_heatmap_mean",
            ):
                assert field in det
            assert len(det["kps"]) == 16
            assert len(det["bbox"]) == 4

    def test_pre_process_meta(self, detector):
        img = np.zeros((100, 200, 3), np.uint8)
        images, meta = detector.pre_process(img)
        assert images.shape == (1, 64, 64, 3)
        assert meta["s"] == 200.0
        np.testing.assert_allclose(meta["c"], [100, 50])


class TestVisualize:
    def test_draw_detections(self):
        from centerpose_tpu.utils.visualize import draw_detections

        img = np.zeros((64, 64, 3), np.uint8)
        det = {
            "bbox": np.array([10, 10, 50, 50.0]),
            "kps": np.linspace(12, 48, 16),
        }
        proj9 = np.random.RandomState(0).rand(9, 2)
        out = draw_detections(img, [det], [(proj9, None, None, None, det)])
        assert out.shape == img.shape
        assert out.max() > 0  # something was drawn

    def test_overlay_heatmap_and_axes(self):
        from centerpose_tpu.utils.visualize import draw_axes, overlay_heatmap

        img = np.zeros((64, 64, 3), np.uint8)
        hm = np.zeros((16, 16))
        hm[8, 8] = 1.0
        out = overlay_heatmap(img, hm)
        assert out.shape == img.shape and out.max() > 0

        cam = np.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]])
        out2 = draw_axes(img, np.eye(3), np.array([0, 0, 1.0]), cam)
        assert out2.max() > 0


class TestMultiScale:
    def test_two_scale_inference(self):
        from centerpose_tpu.config import preset
        from centerpose_tpu.inference.detector import Detector

        cfg = preset(
            "centerpose", input_h=64, input_w=64, K=8, vis_thresh=0.0,
            test_scales=(1.0, 0.75),
        )
        det = Detector(cfg)
        rng = np.random.RandomState(0)
        img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        out = det.run(img)
        assert "results" in out
        # meta kept at scale 1 geometry
        assert out["meta"]["width"] == 128


class TestBatchedInference:
    def test_run_batch(self):
        from centerpose_tpu.config import preset
        from centerpose_tpu.inference.detector import Detector

        cfg = preset("centerpose", input_h=64, input_w=64, K=8, vis_thresh=0.0)
        det = Detector(cfg)
        rng = np.random.RandomState(0)
        imgs = [(rng.rand(96, 128, 3) * 255).astype(np.uint8) for _ in range(3)]
        outs = det.run_batch(imgs)
        assert len(outs) == 3
        for out in outs:
            assert "results" in out and "boxes" in out

    def test_run_batch_stream_matches_run_batch(self):
        """The pipelined generator must yield exactly what per-chunk run_batch
        returns, in order (incl. the fused uint8 warp+net+decode path: equal
        shapes, axis-aligned serving transforms)."""
        from centerpose_tpu.config import preset
        from centerpose_tpu.inference.detector import Detector

        cfg = preset("centerpose", input_h=64, input_w=64, K=8, vis_thresh=0.0)
        det = Detector(cfg)
        rng = np.random.RandomState(1)
        imgs = [(rng.rand(96, 96, 3) * 255).astype(np.uint8) for _ in range(4)]
        chunks = [(imgs[:2], None), (imgs[2:], None)]

        seq = [det.run_batch(c, m) for c, m in chunks]
        stream = list(det.run_batch_stream(iter(chunks)))
        assert len(stream) == len(seq)
        for outs_a, outs_b in zip(seq, stream):
            assert len(outs_a) == len(outs_b)
            for a, b in zip(outs_a, outs_b):
                assert len(a["results"]) == len(b["results"])
                assert len(a["boxes"]) == len(b["boxes"])
                for ra, rb in zip(a["results"], b["results"]):
                    np.testing.assert_allclose(
                        ra["kps"], rb["kps"], rtol=1e-5, atol=1e-5
                    )


class TestDeviceResample:
    def test_device_warp_matches_host(self):
        from centerpose_tpu.geometry.affine import get_affine_transform, warp_affine
        from centerpose_tpu.ops.resample import warp_affine_device

        rng = np.random.RandomState(0)
        img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        c = np.array([64.0, 48.0])
        s = 128.0
        fwd = get_affine_transform(c, s, 0, (64, 64))
        inv = get_affine_transform(c, s, 0, (64, 64), inv=True)

        host = warp_affine(img.astype(np.float32), fwd, (64, 64))
        import jax.numpy as jnp

        dev = np.asarray(
            warp_affine_device(jnp.asarray(img), jnp.asarray(inv, jnp.float32),
                               64, 64, normalize=False)
        )
        np.testing.assert_allclose(dev, host, atol=0.5)  # uint8 bilinear tolerance

    def test_separable_matches_gather(self):
        """Axis-aligned serving warps: the MXU separable path must reproduce
        the 4-corner gather path exactly (same hat weights, same zero border),
        with and without normalization, including out-of-range borders."""
        import jax
        import jax.numpy as jnp

        from centerpose_tpu.geometry.affine import get_affine_transform
        from centerpose_tpu.ops.resample import (
            axis_aligned,
            warp_affine_device,
            warp_separable_batch,
        )

        rng = np.random.RandomState(1)
        imgs = (rng.rand(4, 96, 128, 3) * 255).astype(np.uint8)
        invs = []
        for i, (c, s) in enumerate(
            [((64.0, 48.0), 128.0), ((64.0, 48.0), 200.0),
             ((30.0, 20.0), 64.0), ((100.0, 90.0), 300.0)]
        ):
            invs.append(
                get_affine_transform(np.array(c), s, 0, (64, 64), inv=True)
            )
        assert axis_aligned(invs)
        rot = get_affine_transform(np.array([64.0, 48.0]), 128.0, 30, (64, 64),
                                   inv=True)
        assert not axis_aligned([rot])

        for normalize in (True, False):
            sep = np.asarray(
                warp_separable_batch(
                    jnp.asarray(imgs),
                    jnp.asarray(np.stack(invs), jnp.float32),
                    64, 64, normalize=normalize,
                )
            )
            gat = np.asarray(
                jax.vmap(
                    lambda im, t: warp_affine_device(im, t, 64, 64,
                                                     normalize=normalize)
                )(jnp.asarray(imgs), jnp.asarray(np.stack(invs), jnp.float32))
            )
            np.testing.assert_allclose(sep, gat, atol=2e-3 if normalize else 0.02)


    def test_budget_fallback_matches_separable(self, monkeypatch):
        """Above the HBM source-pixel budget the axis-aligned warp falls back
        to the gather formulation (ADVICE r4 #3); both paths must agree."""
        import jax.numpy as jnp

        from centerpose_tpu.ops import resample

        rng = np.random.RandomState(2)
        imgs = (rng.rand(2, 40, 56, 3) * 255).astype(np.uint8)
        t = np.array([[[0.9, 0.0, 1.5], [0.0, 1.1, -2.0]]] * 2, np.float32)
        ref = np.asarray(resample.warp_separable_batch(
            jnp.asarray(imgs), jnp.asarray(t), 32, 32))
        monkeypatch.setattr(resample, "_SEPARABLE_SRC_PIXEL_BUDGET", 1)
        out = np.asarray(resample.warp_axis_aligned_batch(
            jnp.asarray(imgs), jnp.asarray(t), 32, 32))
        np.testing.assert_allclose(out, ref, atol=1e-4)


class TestPreprocessModes:
    """base_detector.pre_process mode parity (base_detector.py:91-148)."""

    def _detector(self, **kw):
        cfg = preset("centerpose", input_h=64, input_w=64, K=8, vis_thresh=0.0, **kw)
        return Detector(cfg)

    def test_fix_short_shapes_and_center_mapping(self):
        det = self._detector(fix_short=64)
        img = np.zeros((100, 300, 3), np.uint8)  # landscape: short side = height
        images, meta = det.pre_process(img)
        # short side -> 64, long side rounded up to a multiple of 64.
        assert images.shape[1] == 64
        assert images.shape[2] == (int(300 / 100 * 64) + 63) // 64 * 64
        assert meta["out_height"] == images.shape[1] // 4
        # image center maps to input-grid center.
        from centerpose_tpu.geometry.affine import affine_transform, get_affine_transform

        trans = get_affine_transform(meta["c"], meta["s"], 0,
                                     (images.shape[2], images.shape[1]))
        ctr = affine_transform([150.0, 50.0], trans)
        np.testing.assert_allclose(ctr, [images.shape[2] / 2, images.shape[1] / 2],
                                   atol=1e-3)

    def test_fix_short_portrait(self):
        det = self._detector(fix_short=64)
        img = np.zeros((300, 100, 3), np.uint8)
        images, _ = det.pre_process(img)
        assert images.shape[2] == 64
        assert images.shape[1] == (int(300 / 100 * 64) + 63) // 64 * 64

    def test_keep_res_pads_and_translates(self):
        det = self._detector(fix_res=False)
        img = np.zeros((60, 90, 3), np.uint8)
        images, meta = det.pre_process(img)
        assert images.shape[1:3] == ((60 | 31) + 1, (90 | 31) + 1)  # 64, 96
        # keep-res is a pure translation: pixel p -> p + (inp/2 - c).
        from centerpose_tpu.geometry.affine import affine_transform, get_affine_transform

        inp_h, inp_w = images.shape[1:3]
        trans = get_affine_transform(meta["c"], meta["s"], 0, (inp_w, inp_h))
        p = affine_transform([10.0, 20.0], trans)
        np.testing.assert_allclose(
            p, [10.0 - 45 + inp_w / 2, 20.0 - 30 + inp_h / 2], atol=1e-3
        )

    def test_fix_res_multiscale_zooms_out(self):
        """At scale 0.5 the image must occupy half the input window (the crop
        extent stays max(orig h, w)) — not be resampled back to full size."""
        det = self._detector()
        img = np.zeros((128, 128, 3), np.uint8)
        _, meta = det.pre_process(img, scale=0.5)
        assert meta["s"] == 128.0  # original extent
        np.testing.assert_allclose(meta["c"], [32.0, 32.0])  # resized center
        from centerpose_tpu.geometry.affine import affine_transform, get_affine_transform

        trans = get_affine_transform(meta["c"], meta["s"], 0, (64, 64))
        # resized-image corner (0,0) lands at 1/4 of the window, not its corner.
        np.testing.assert_allclose(affine_transform([0.0, 0.0], trans), [16.0, 16.0],
                                   atol=1e-3)

    def test_keep_res_end_to_end(self):
        det = self._detector(fix_res=False)
        rng = np.random.RandomState(0)
        img = (rng.rand(60, 90, 3) * 255).astype(np.uint8)
        out = det.run(img)
        assert out["meta"]["height"] == 60
        for d in out["results"]:
            assert np.all(np.isfinite(d["bbox"]))

    def test_fix_short_end_to_end(self):
        det = self._detector(fix_short=64)
        rng = np.random.RandomState(1)
        img = (rng.rand(80, 120, 3) * 255).astype(np.uint8)
        out = det.run(img)
        assert len(out["results"]) <= det.cfg.K


class TestFusedRunParity:
    """The fused (in-program device warp) run() path is the DEFAULT serving
    path; assert detection parity against the host-warp path it replaced
    (ADVICE r4 #2). `force_host_warp` flips the gate without changing any
    other behavior."""

    def _compare(self, out_f, out_h, atol_px=0.75, atol_score=5e-3):
        rf, rh = out_f["results"], out_h["results"]
        assert len(rf) == len(rh)
        for a, b in zip(rf, rh):
            assert abs(a["score"] - b["score"]) < atol_score
            np.testing.assert_allclose(a["kps"], b["kps"], atol=atol_px)
            np.testing.assert_allclose(a["bbox"], b["bbox"], atol=atol_px)

    def _match_compare(self, out_f, out_h, atol_px=0.75, atol_score=5e-3,
                       max_unmatched=1):
        """Set-style parity: random-weight heatmaps have near-tie top-K peaks,
        so sub-pixel warp differences can flip the greedy association and
        change the RESULT COUNT by one in a single legitimate step. Match
        entries by bbox and require strict field parity on the matches, with
        at most `max_unmatched` unmatched leftovers."""
        rf, rh = out_f["results"], out_h["results"]
        used, matched = set(), 0
        for a in rf:
            best, bj = None, None
            for j, b in enumerate(rh):
                if j in used:
                    continue
                d = float(np.max(np.abs(np.asarray(a["bbox"], np.float64)
                                        - np.asarray(b["bbox"], np.float64))))
                if best is None or d < best:
                    best, bj = d, j
            if best is not None and best < atol_px:
                used.add(bj)
                matched += 1
                b = rh[bj]
                assert abs(a["score"] - b["score"]) < atol_score
                np.testing.assert_allclose(a["kps"], b["kps"], atol=atol_px)
        assert matched >= max(len(rf), len(rh)) - max_unmatched, \
            (matched, len(rf), len(rh))

    def test_single_stream_parity(self):
        from centerpose_tpu.config import preset
        from centerpose_tpu.inference.detector import Detector

        cfg = preset("centerpose", input_h=64, input_w=64, K=8,
                     vis_thresh=0.0, compute_dtype="float32")
        det = Detector(cfg)
        rng = np.random.RandomState(5)
        img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        out_f = det.run(img)
        det.force_host_warp = True
        out_h = det.run(img)
        det.force_host_warp = False
        assert len(out_f["results"]) > 0
        self._compare(out_f, out_h)

    def test_tracking_sequence_parity(self):
        """3-frame tracking sequence: frame 0 is host-warped in both paths
        (pre_images must exist first), frames 1-2 exercise the fused tracking
        program (in-program pre-hm render + pre_images chaining) vs the host
        path, with live tracks (new_thresh=0 spawns from any detection)."""
        from centerpose_tpu.config import preset
        from centerpose_tpu.inference.detector import Detector

        cfg = preset("centerpose_track", input_h=64, input_w=64, K=4,
                     vis_thresh=0.0, new_thresh=0.0,
                     compute_dtype="float32")
        import copy

        det_f = Detector(cfg)
        det_h = Detector(cfg, det_f.variables)
        det_h.force_host_warp = True
        rng = np.random.RandomState(7)
        frames = [(rng.rand(96, 96, 3) * 255).astype(np.uint8)
                  for _ in range(3)]
        for i, img in enumerate(frames):
            # Sync the host-path detector to the fused detector's pre-frame
            # state: the comparison is per-STEP parity — without the sync,
            # sub-pixel warp differences compound through track spawn/aging
            # and the result lists eventually diverge structurally.
            det_h.tracker = copy.deepcopy(det_f.tracker)
            det_h.pre_images = det_f.pre_images
            out_f = det_f.run(img)
            out_h = det_h.run(img)
            self._match_compare(out_f, out_h)
        assert det_f.tracker is not None and det_f.tracker.active_tracks()
