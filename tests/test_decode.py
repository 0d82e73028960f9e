import numpy as np
import pytest

import jax.numpy as jnp

from centerpose_tpu.ops.decode import (
    heat_nms,
    object_pose_decode,
    sigmoid_clamped,
    topk,
    topk_channel,
)

H = W = 32
J = 8


def _gaussian_map(h, w, cx, cy, sigma=1.5, peak=1.0):
    ys, xs = np.mgrid[0:h, 0:w]
    return peak * np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma ** 2))


def _logit(p):
    p = np.clip(p, 1e-6, 1 - 1e-6)
    return np.log(p / (1 - p))


def _make_outputs(center=(10, 12), kp_offsets=None, scale=(1.0, 2.0, 3.0)):
    """One object: center gaussian + 8 keypoint heatmaps + consistent heads."""
    cx, cy = center
    if kp_offsets is None:
        rng = np.random.RandomState(0)
        kp_offsets = rng.randint(-6, 7, size=(J, 2)).astype(np.float32)
    kp_offsets = np.asarray(kp_offsets, np.float32)

    hm = _gaussian_map(H, W, cx, cy)[None, :, :, None]
    hm_hp = np.zeros((1, H, W, J), np.float32)
    hps = np.zeros((1, H, W, 2 * J), np.float32)
    for jj in range(J):
        kx, ky = cx + kp_offsets[jj, 0], cy + kp_offsets[jj, 1]
        hm_hp[0, :, :, jj] = _gaussian_map(H, W, kx, ky)
        hps[0, cy, cx, 2 * jj] = kp_offsets[jj, 0]
        hps[0, cy, cx, 2 * jj + 1] = kp_offsets[jj, 1]

    wh = np.zeros((1, H, W, 2), np.float32)
    wh[0, cy, cx] = [20.0, 20.0]
    reg = np.zeros((1, H, W, 2), np.float32)
    reg[0, cy, cx] = [0.25, -0.25]
    hp_offset = np.zeros((1, H, W, 2), np.float32)
    scale_map = np.zeros((1, H, W, 3), np.float32)
    scale_map[0, cy, cx] = scale

    return {
        "hm": jnp.asarray(_logit(hm)),
        "hm_hp": jnp.asarray(_logit(hm_hp)),
        "hps": jnp.asarray(hps),
        "wh": jnp.asarray(wh),
        "reg": jnp.asarray(reg),
        "hp_offset": jnp.asarray(hp_offset),
        "scale": jnp.asarray(scale_map),
    }, kp_offsets


class TestPrimitives:
    def test_nms_keeps_single_peak(self):
        hm = jnp.asarray(_gaussian_map(H, W, 10, 12)[None, :, :, None])
        out = np.asarray(heat_nms(hm))
        # The true peak survives; everything else significant is suppressed
        # (float-equal plateaus in the far tail may survive, as in the reference).
        assert (out > 0.01).sum() == 1
        assert out[0, 12, 10, 0] == pytest.approx(1.0)

    def test_topk_single_class(self):
        hm = np.zeros((1, H, W, 1), np.float32)
        hm[0, 5, 7, 0] = 0.9
        hm[0, 20, 3, 0] = 0.8
        score, inds, clses, ys, xs = topk(jnp.asarray(hm), 4)
        assert float(score[0, 0]) == pytest.approx(0.9)
        assert (int(xs[0, 0]), int(ys[0, 0])) == (7, 5)
        assert (int(xs[0, 1]), int(ys[0, 1])) == (3, 20)
        assert int(inds[0, 0]) == 5 * W + 7
        assert int(clses[0, 0]) == 0

    def test_topk_channel(self):
        hm = np.zeros((1, H, W, 2), np.float32)
        hm[0, 4, 6, 0] = 0.7
        hm[0, 9, 2, 1] = 0.6
        score, inds, ys, xs = topk_channel(jnp.asarray(hm), 3)
        assert float(score[0, 0, 0]) == pytest.approx(0.7)
        assert (int(xs[0, 0, 0]), int(ys[0, 0, 0])) == (6, 4)
        assert (int(xs[0, 1, 0]), int(ys[0, 1, 0])) == (2, 9)

    def test_sigmoid_clamped(self):
        x = jnp.asarray([-100.0, 0.0, 100.0])
        y = np.asarray(sigmoid_clamped(x))
        assert y[0] == pytest.approx(1e-4)
        assert y[2] == pytest.approx(1 - 1e-4)


class TestDecode:
    def test_center_and_score(self):
        outputs, _ = _make_outputs()
        dets = object_pose_decode(outputs, k=8)
        assert float(dets["scores"][0, 0, 0]) > 0.9
        bb = np.asarray(dets["bboxes"][0, 0])
        # center from bbox midpoint includes the reg offset (0.25, -0.25)
        assert (bb[0] + bb[2]) / 2 == pytest.approx(10.25, abs=1e-3)
        assert (bb[1] + bb[3]) / 2 == pytest.approx(11.75, abs=1e-3)

    def test_keypoints_snap_to_heatmap_peaks(self):
        kp_off = np.array(
            [[3, 2], [-3, 2], [3, -2], [-3, -2], [5, 4], [-5, 4], [5, -4], [-5, -4]],
            np.float32,
        )
        outputs, _ = _make_outputs(kp_offsets=kp_off)
        dets = object_pose_decode(outputs, k=8)
        kps = np.asarray(dets["kps"][0, 0]).reshape(J, 2)
        expect = np.array([10, 12], np.float32) + kp_off
        np.testing.assert_allclose(kps, expect, atol=0.1)

    def test_displacement_mean_ignores_heatmap(self):
        kp_off = np.array([[3, 2]] * J, np.float32)
        outputs, _ = _make_outputs(kp_offsets=kp_off)
        # Destroy the keypoint heatmaps: displacement mean must be unaffected.
        outputs["hm_hp"] = jnp.full_like(outputs["hm_hp"], _logit(1e-4))
        dets = object_pose_decode(outputs, k=8)
        disp = np.asarray(dets["kps_displacement_mean"][0, 0]).reshape(J, 2)
        np.testing.assert_allclose(disp, np.tile([13.0, 14.0], (J, 1)), atol=0.01)
        # With no valid peaks, blended kps falls back to displacement too.
        kps = np.asarray(dets["kps"][0, 0]).reshape(J, 2)
        np.testing.assert_allclose(kps, disp, atol=0.01)

    def test_heatmap_stats_valid_object(self):
        kp_off = np.array(
            [[3, 2], [-3, 2], [3, -2], [-3, -2], [5, 4], [-5, 4], [5, -4], [-5, -4]],
            np.float32,
        )
        outputs, _ = _make_outputs(kp_offsets=kp_off)
        dets = object_pose_decode(outputs, k=8, rep_mode=2)
        mean = np.asarray(dets["kps_heatmap_mean"][0, 0]).reshape(J, 2)
        std = np.asarray(dets["kps_heatmap_std"][0, 0]).reshape(J, 2)
        height = np.asarray(dets["kps_heatmap_height"][0, 0])
        expect = np.array([10, 12], np.float32) + kp_off
        np.testing.assert_allclose(mean, expect, atol=0.2)
        assert np.all(std > 0.5) and np.all(std < 4.0)
        np.testing.assert_allclose(height, 1.0, atol=0.05)

    def test_heatmap_stats_invalid_sentinel(self):
        outputs, _ = _make_outputs()
        outputs["hm_hp"] = jnp.full_like(outputs["hm_hp"], _logit(1e-4))
        dets = object_pose_decode(outputs, k=8, rep_mode=2)
        assert np.all(np.asarray(dets["kps_heatmap_mean"][0, 0]) == -10000.0)
        assert np.all(np.asarray(dets["kps_heatmap_height"][0, 0]) == -10000.0)

    def test_scale_gather(self):
        outputs, _ = _make_outputs(scale=(0.5, 1.0, 1.5))
        dets = object_pose_decode(outputs, k=8)
        np.testing.assert_allclose(
            np.asarray(dets["obj_scale"][0, 0]), [0.5, 1.0, 1.5], atol=1e-5
        )

    def test_rep_mode_3_pure_displacement(self):
        kp_off = np.array([[4, 0]] * J, np.float32)
        outputs, _ = _make_outputs(kp_offsets=kp_off)
        # Shift every heatmap peak by 1 px; rep_mode 3 must ignore them.
        dets3 = object_pose_decode(outputs, k=8, rep_mode=3)
        kps3 = np.asarray(dets3["kps"][0, 0]).reshape(J, 2)
        disp = np.asarray(dets3["kps_displacement_mean"][0, 0]).reshape(J, 2)
        np.testing.assert_allclose(kps3, disp, atol=1e-5)

    def test_shapes_static(self):
        outputs, _ = _make_outputs()
        dets = object_pose_decode(outputs, k=16)
        assert dets["bboxes"].shape == (1, 16, 4)
        assert dets["kps"].shape == (1, 16, 2 * J)
        assert dets["kps_heatmap_height"].shape == (1, 16, J)
        assert dets["tracking"].shape == (1, 16, 2)  # zero-filled when head absent
        assert np.all(np.asarray(dets["tracking"]) == 0)
