"""Decode parity: the fused JAX decode vs an independent numpy mirror.

The reference has no importable decode here (its DCNv2 extension isn't built), so
this mirror re-implements `object_pose_decode`'s semantics (decode.py:72-302)
directly from the documented behavior in plain numpy, written independently of
centerpose_tpu.ops.decode — catching transcription errors in either one.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from centerpose_tpu.ops.decode import object_pose_decode

B, H, W, J, K = 2, 24, 24, 8, 6


def _sigmoid(x):
    return np.clip(1.0 / (1.0 + np.exp(-x)), 1e-4, 1 - 1e-4)


def _nms_np(heat):
    out = np.zeros_like(heat)
    padded = np.pad(heat, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-np.inf)
    for dy in range(3):
        for dx in range(3):
            out = np.maximum(out, padded[:, dy : dy + H, dx : dx + W])
    return np.where(out == heat, heat, 0.0)


def numpy_decode(outputs, k=K, thresh=0.1):
    """Mirror of decode.py:72-176 (training path, rep_mode 1 blending)."""
    heat = _sigmoid(outputs["hm"])
    heat = _nms_np(heat)
    flat = heat.reshape(B, -1)
    inds = np.argsort(-flat, axis=1)[:, :k]
    scores = np.take_along_axis(flat, inds, axis=1)
    ys = (inds // W).astype(np.float64)
    xs = (inds % W).astype(np.float64)

    kps_map = outputs["hps"].reshape(B, H * W, 2 * J)
    kps = np.stack([kps_map[b][inds[b]] for b in range(B)])  # [B,K,2J]
    kps = kps.reshape(B, k, J, 2) + np.stack([xs, ys], -1)[:, :, None, :]
    disp_mean = kps.reshape(B, k, 2 * J).copy()

    reg = outputs["reg"].reshape(B, H * W, 2)
    reg_k = np.stack([reg[b][inds[b]] for b in range(B)])
    xs_c = xs + reg_k[..., 0]
    ys_c = ys + reg_k[..., 1]
    wh = outputs["wh"].reshape(B, H * W, 2)
    wh_k = np.stack([wh[b][inds[b]] for b in range(B)])
    bboxes = np.stack(
        [xs_c - wh_k[..., 0] / 2, ys_c - wh_k[..., 1] / 2,
         xs_c + wh_k[..., 0] / 2, ys_c + wh_k[..., 1] / 2], -1,
    )

    # keypoint heatmap branch
    hm_hp = _sigmoid(outputs["hm_hp"])
    hm_hp_n = _nms_np(hm_hp)
    hp_flat = hm_hp_n.transpose(0, 3, 1, 2).reshape(B, J, H * W)
    hp_inds = np.argsort(-hp_flat, axis=2)[:, :, :k]
    hm_score = np.take_along_axis(hp_flat, hp_inds, axis=2)
    hm_ys = (hp_inds // W).astype(np.float64)
    hm_xs = (hp_inds % W).astype(np.float64)
    hp_off = outputs["hp_offset"].reshape(B, H * W, 2)
    for b in range(B):
        for j in range(J):
            off = hp_off[b][hp_inds[b, j]]
            hm_xs[b, j] += off[:, 0]
            hm_ys[b, j] += off[:, 1]
    mask = hm_score > thresh
    hm_score = np.where(mask, hm_score, -1.0)
    hm_xs = np.where(mask, hm_xs, -10000.0)
    hm_ys = np.where(mask, hm_ys, -10000.0)

    kps_jk = kps.transpose(0, 2, 1, 3)  # [B,J,K,2]
    blended = np.zeros_like(kps_jk)
    for b in range(B):
        for j in range(J):
            for kk_ in range(k):
                d = np.hypot(
                    kps_jk[b, j, kk_, 0] - hm_xs[b, j],
                    kps_jk[b, j, kk_, 1] - hm_ys[b, j],
                )
                m = int(np.argmin(d))
                sel = np.array([hm_xs[b, j, m], hm_ys[b, j, m]])
                sc = hm_score[b, j, m]
                l, t, r, bm = bboxes[b, kk_]
                span = max(bm - t, r - l)
                bad = (
                    sel[0] < l or sel[0] > r or sel[1] < t or sel[1] > bm
                    or sc < thresh or d[m] > span * 0.3
                )
                blended[b, j, kk_] = kps_jk[b, j, kk_] if bad else sel
    return {
        "scores": scores,
        "xs_c": xs_c,
        "ys_c": ys_c,
        "bboxes": bboxes,
        "kps": blended.transpose(0, 2, 1, 3).reshape(B, k, 2 * J),
        "kps_displacement_mean": disp_mean,
        # intermediates for the inference-extras mirror
        "_hm_xs": hm_xs, "_hm_ys": hm_ys, "_hm_score": hm_score,
        "_kps_jk": kps_jk, "_hm_hp_raw": hm_hp,
    }


def numpy_decode_inference(outputs, k=K, thresh=0.1):
    """Mirror of the Inference=True extras (decode.py:177-256 reference;
    ops/decode.py:305-332): the 7-condition validity mask, -10000 sentinel
    plumbing, and the fit_gaussian=False heatmap stats (mean = filtered peak,
    std = 1, height = pre-NMS heatmap value at the truncated peak pixel)."""
    base = numpy_decode(outputs, k, thresh)
    hm_xs, hm_ys = base["_hm_xs"], base["_hm_ys"]
    hm_score, kps_jk = base["_hm_score"], base["_kps_jk"]
    hm_raw = base["_hm_hp_raw"]  # [B, H, W, J] sigmoid, pre-NMS
    bboxes, scores = base["bboxes"], base["scores"]

    mean = np.full((B, J, k, 2), -10000.0)
    std = np.full((B, J, k, 2), -10000.0)
    height = np.full((B, J, k), -10000.0)
    for b in range(B):
        for j in range(J):
            for kk_ in range(k):
                d = np.hypot(
                    kps_jk[b, j, kk_, 0] - hm_xs[b, j],
                    kps_jk[b, j, kk_, 1] - hm_ys[b, j],
                )
                m = int(np.argmin(d))
                sel = np.array([hm_xs[b, j, m], hm_ys[b, j, m]])
                sc = hm_score[b, j, m]
                l, t, r, bm = bboxes[b, kk_]
                span = max(bm - t, r - l)
                ok = (
                    sel[0] > 0.8 * l and sel[0] < 1.2 * r
                    and sel[1] > 0.8 * t and sel[1] < 1.2 * bm
                    and sc > thresh and d[m] < span * 0.5
                    and scores[b, kk_] > thresh
                )
                if not ok:
                    continue
                mean[b, j, kk_] = sel
                std[b, j, kk_] = 1.0
                iy = int(np.clip(np.float32(sel[1]), 0, H - 1))
                ix = int(np.clip(np.float32(sel[0]), 0, W - 1))
                height[b, j, kk_] = hm_raw[b, iy, ix, j]
    return {
        "kps_heatmap_mean": mean.transpose(0, 2, 1, 3).reshape(B, k, 2 * J),
        "kps_heatmap_std": std.transpose(0, 2, 1, 3).reshape(B, k, 2 * J),
        "kps_heatmap_height": height.transpose(0, 2, 1),
        "kps": base["kps"],
        "bboxes": bboxes,
    }


def numpy_decode_inference_fit(outputs, k=K, thresh=0.1):
    """Mirror of the fit_gaussian=True stats (reference decode.py:209-256 /
    gpfit.moments): per valid keypoint, an 11x11 window is cut around the
    truncated peak pixel (zero-padded at image borders), and gaussian
    parameters come from moments — mu = intensity-weighted centroid, std from
    the 1-D profiles through the integer centroid, height = window max.
    Written independently of ops/decode.py (loops, not vectorized)."""
    base = numpy_decode_inference(outputs, k, thresh)
    valid = base["kps_heatmap_std"].reshape(B, k, J, 2)[..., 0] != -10000.0
    peak_xy = base["kps_heatmap_mean"].reshape(B, k, J, 2)  # filtered peaks
    hm_raw = _sigmoid(outputs["hm_hp"])  # [B, H, W, J]

    ran = 5
    mean = np.full((B, k, J, 2), -10000.0)
    std = np.full((B, k, J, 2), -10000.0)
    height = np.full((B, k, J), -10000.0)
    padded = np.pad(hm_raw, ((0, 0), (ran, ran), (ran, ran), (0, 0)))
    for b in range(B):
        for kk_ in range(k):
            for j in range(J):
                if not valid[b, kk_, j]:
                    continue
                px, py = peak_xy[b, kk_, j]
                ix = int(np.clip(np.float32(px), 0, W - 1))
                iy = int(np.clip(np.float32(py), 0, H - 1))
                win = padded[b, iy:iy + 2 * ran + 1, ix:ix + 2 * ran + 1, j]
                total = win.sum()
                rows = np.arange(2 * ran + 1)
                mu_y = (win.sum(axis=1) * rows).sum() / total
                mu_x = (win.sum(axis=0) * rows).sum() / total
                col = win[:, int(mu_x)]  # profile along y at the centroid col
                row = win[int(mu_y), :]
                std_y = np.sqrt(
                    (np.abs((rows - mu_y) ** 2 * col)).sum() / col.sum()
                )
                std_x = np.sqrt(
                    (np.abs((rows - mu_x) ** 2 * row)).sum() / row.sum()
                )
                mean[b, kk_, j] = (px + mu_x - ran, py + mu_y - ran)
                std[b, kk_, j] = (std_x, std_y)
                height[b, kk_, j] = win.max()
    return {
        "kps_heatmap_mean": mean.reshape(B, k, 2 * J),
        "kps_heatmap_std": std.reshape(B, k, 2 * J),
        "kps_heatmap_height": height,
    }


@pytest.fixture(scope="module")
def head_outputs():
    rng = np.random.RandomState(42)
    return {
        "hm": rng.randn(B, H, W, 1).astype(np.float32) * 2,
        "hps": (rng.randn(B, H, W, 2 * J) * 3).astype(np.float32),
        "wh": np.abs(rng.randn(B, H, W, 2) * 4).astype(np.float32) + 2,
        "reg": rng.rand(B, H, W, 2).astype(np.float32),
        "hm_hp": rng.randn(B, H, W, J).astype(np.float32) * 2,
        "hp_offset": rng.rand(B, H, W, 2).astype(np.float32),
        "scale": rng.rand(B, H, W, 3).astype(np.float32),
    }


class TestDecodeParity:
    def test_matches_numpy_mirror(self, head_outputs):
        ref = numpy_decode(head_outputs)
        got = object_pose_decode(
            {k_: jnp.asarray(v) for k_, v in head_outputs.items()},
            k=K, rep_mode=1, inference=False, apply_sigmoid=True,
        )
        np.testing.assert_allclose(
            np.asarray(got["scores"])[..., 0], ref["scores"], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got["bboxes"]), ref["bboxes"], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got["kps_displacement_mean"]),
            ref["kps_displacement_mean"],
            atol=1e-4,
        )
        np.testing.assert_allclose(np.asarray(got["kps"]), ref["kps"], atol=1e-4)

    def test_matches_numpy_mirror_inference_extras(self, head_outputs):
        """Inference extras: 7-condition mask, sentinel plumbing, and
        fit_gaussian=False heatmap stats (VERDICT r1 weak #5)."""
        ref = numpy_decode_inference(head_outputs)
        got = object_pose_decode(
            {k_: jnp.asarray(v) for k_, v in head_outputs.items()},
            k=K, rep_mode=1, inference=True, fit_gaussian=False,
            apply_sigmoid=True,
        )
        np.testing.assert_allclose(np.asarray(got["kps"]), ref["kps"], atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(got["kps_heatmap_mean"]), ref["kps_heatmap_mean"],
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(got["kps_heatmap_std"]), ref["kps_heatmap_std"], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got["kps_heatmap_height"]), ref["kps_heatmap_height"],
            atol=1e-5,
        )

    def test_matches_numpy_mirror_gaussian_fit(self, head_outputs):
        """fit_gaussian=True window moments vs an independent loop mirror."""
        ref = numpy_decode_inference_fit(head_outputs)
        got = object_pose_decode(
            {k_: jnp.asarray(v) for k_, v in head_outputs.items()},
            k=K, rep_mode=1, inference=True, fit_gaussian=True,
            apply_sigmoid=True,
        )
        np.testing.assert_allclose(
            np.asarray(got["kps_heatmap_mean"]), ref["kps_heatmap_mean"],
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(got["kps_heatmap_std"]), ref["kps_heatmap_std"],
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(got["kps_heatmap_height"]), ref["kps_heatmap_height"],
            atol=1e-5,
        )
