"""Fused CenterPose decode — one jitted XLA program.

Parity target: `object_pose_decode` (src/lib/models/decode.py:72-375) plus the helper
kernels `_nms` (:17-23), `_topk`/`_topk_channel` (:40-68) and the python gaussian-fit
loop (:191-256, calling `gpfit.fitgaussian`). The reference crosses device→host inside
decode to run a B×J×K python loop of scipy least-squares fits; here EVERYTHING —
sigmoid, max-pool NMS, top-K, gathers, displacement grouping, heatmap-peak
association, gating, window extraction and batched gaussian moments — is one XLA
program with static shapes.

Deviation notes (documented, not accidental):
  * The reference's `gpfit.moments` swaps row/column when labelling (mu_x, mu_y,
    std_x, std_y) (gpfit.py:13-26: its "x" is the ROW index). For the symmetric
    gaussian windows this produces the same numbers up to noise; this implementation
    uses the correct axis labelling.
  * `fitgaussian` runs scipy least_squares with max_nfev=1 — i.e. essentially the
    moments initialization. We use pure batched moments (the paper's intent), which
    matches within fp tolerance on rendered gaussians.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

INVALID = -10000.0
_FIT_WIN = 11  # 11x11 window (decode.py:219 `win = 11`)
_FIT_RAN = _FIT_WIN // 2


def sigmoid_clamped(x: jnp.ndarray) -> jnp.ndarray:
    """models/utils.py:9-11 `_sigmoid`: sigmoid clamped to [1e-4, 1-1e-4]."""
    return jnp.clip(jax.nn.sigmoid(x), 1e-4, 1 - 1e-4)


def heat_nms(heat: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """3x3 max-pool peak suppression (decode.py:17-23). NHWC."""
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        heat,
        -jnp.inf,
        jax.lax.max,
        (1, kernel, kernel, 1),
        (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return jnp.where(hmax == heat, heat, 0.0)


def topk(scores: jnp.ndarray, k: int):
    """Two-stage top-K over [B, H, W, C] (decode.py:52-68).

    Returns (score, inds, clses, ys, xs), each [B, K]; `inds` indexes the flattened
    single-class H*W map.
    """
    b, h, w, c = scores.shape
    flat = scores.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    cls_scores, cls_inds = jax.lax.top_k(flat, k)  # [B, C, K]
    ys = (cls_inds // w).astype(jnp.float32)
    xs = (cls_inds % w).astype(jnp.float32)

    all_scores = cls_scores.reshape(b, c * k)
    score, ind = jax.lax.top_k(all_scores, k)  # [B, K]
    clses = (ind // k).astype(jnp.int32)

    def pick(t):
        return jnp.take_along_axis(t.reshape(b, c * k), ind, axis=1)

    return score, pick(cls_inds), clses, pick(ys), pick(xs)


def topk_channel(scores: jnp.ndarray, k: int):
    """Per-channel top-K over [B, H, W, C] (decode.py:40-49).

    Returns (score, inds, ys, xs), each [B, C, K].
    """
    b, h, w, c = scores.shape
    flat = scores.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    score, inds = jax.lax.top_k(flat, k)
    ys = (inds // w).astype(jnp.float32)
    xs = (inds % w).astype(jnp.float32)
    return score, inds, ys, xs


def gather_feat(feat: jnp.ndarray, ind: jnp.ndarray) -> jnp.ndarray:
    """Gather [B, H, W, C] at flattened-spatial indices [B, K] → [B, K, C].

    Row-slice gather (full-C slices per index) — the TPU-fast lowering.
    """
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    return jax.vmap(lambda xf, ix: xf[ix])(flat, ind.astype(jnp.int32))


def _batched_gaussian_moments(windows: jnp.ndarray):
    """Gaussian parameters by moments for [..., win, win] heatmap windows.

    Returns (height, mu_x, mu_y, std_x, std_y) each [...]. mu are window-relative
    (0..win-1); x = column axis. Equivalent of gpfit.moments (gpfit.py:13-26),
    vectorized; see module docstring for the axis-labelling deviation.
    """
    win = windows.shape[-1]
    total = jnp.maximum(windows.sum(axis=(-2, -1)), 1e-12)
    rows = jnp.arange(win, dtype=jnp.float32)
    mu_y = (windows.sum(axis=-1) * rows).sum(axis=-1) / total
    mu_x = (windows.sum(axis=-2) * rows).sum(axis=-1) / total
    height = windows.max(axis=(-2, -1))

    # Reference: std along each axis from the 1-D profile through the integer
    # centroid (gpfit.py:21-24). Gather that row/column per window.
    iy = jnp.clip(mu_y.astype(jnp.int32), 0, win - 1)
    ix = jnp.clip(mu_x.astype(jnp.int32), 0, win - 1)
    col = jnp.take_along_axis(
        windows, ix[..., None, None], axis=-1
    ).squeeze(-1)  # [..., win] profile along y at x=ix
    row = jnp.take_along_axis(
        windows, iy[..., None, None], axis=-2
    ).squeeze(-2)  # [..., win] profile along x at y=iy
    col_sum = jnp.maximum(col.sum(axis=-1), 1e-12)
    row_sum = jnp.maximum(row.sum(axis=-1), 1e-12)
    std_y = jnp.sqrt(
        jnp.abs((rows - mu_y[..., None]) ** 2 * col).sum(axis=-1) / col_sum
    )
    std_x = jnp.sqrt(
        jnp.abs((rows - mu_x[..., None]) ** 2 * row).sum(axis=-1) / row_sum
    )
    return height, mu_x, mu_y, std_x, std_y


def _heatmap_gaussian_stats(hm_hp_raw, hm_xs_f, hm_ys_f, valid, fit: bool):
    """Batched replacement for the reference's python gaussian-fit loop
    (decode.py:209-256).

    Args:
      hm_hp_raw: [B, H, W, J] pre-NMS sigmoid keypoint heatmaps.
      hm_xs_f/hm_ys_f: [B, J, K] filtered integer-ish peak coords (INVALID where bad).
      valid: [B, J, K] bool.
      fit: rep_mode 2 / tracking behavior — fit gaussian params; if False
           (rep_mode 1 plain), mean=peak, std=1, height=peak value.

    Returns (mean_xy [B,J,K,2], std_xy [B,J,K,2], height [B,J,K]).
    """
    b, h, w, j = hm_hp_raw.shape
    k = hm_xs_f.shape[-1]
    ran = _FIT_RAN

    hm = hm_hp_raw.transpose(0, 3, 1, 2)  # [B, J, H, W]
    padded = jnp.pad(hm, ((0, 0), (0, 0), (ran, ran), (ran, ran)))
    hp, wp = h + 2 * ran, w + 2 * ran
    flat = padded.reshape(b, j, hp * wp)

    x0 = jnp.clip(hm_xs_f.astype(jnp.int32), 0, w - 1)  # window origin on padded map
    y0 = jnp.clip(hm_ys_f.astype(jnp.int32), 0, h - 1)
    dy = jnp.arange(_FIT_WIN, dtype=jnp.int32)
    dx = jnp.arange(_FIT_WIN, dtype=jnp.int32)
    rows_idx = y0[..., None, None] + dy[None, None, None, :, None]  # [B,J,K,11,1]
    cols_idx = x0[..., None, None] + dx[None, None, None, None, :]  # [B,J,K,1,11]
    idx = (rows_idx * wp + cols_idx).reshape(b, j, k * _FIT_WIN * _FIT_WIN)
    windows = jnp.take_along_axis(flat, idx, axis=2).reshape(
        b, j, k, _FIT_WIN, _FIT_WIN
    )

    peak_val = windows[..., ran, ran]
    if fit:
        height, mu_x, mu_y, std_x, std_y = _batched_gaussian_moments(windows)
        mean_x = hm_xs_f + mu_x - ran
        mean_y = hm_ys_f + mu_y - ran
    else:
        height = peak_val
        mean_x, mean_y = hm_xs_f, hm_ys_f
        std_x = jnp.ones_like(mean_x)
        std_y = jnp.ones_like(mean_y)

    mean = jnp.stack([mean_x, mean_y], axis=-1)
    std = jnp.stack([std_x, std_y], axis=-1)
    valid_f = valid[..., None]
    mean = jnp.where(valid_f, mean, INVALID)
    std = jnp.where(valid_f, std, INVALID)
    height = jnp.where(valid, height, INVALID)
    return mean, std, height


@partial(
    jax.jit,
    static_argnames=("k", "rep_mode", "inference", "fit_gaussian", "apply_sigmoid"),
)
def object_pose_decode(
    outputs: Dict[str, jnp.ndarray],
    *,
    k: int = 100,
    rep_mode: int = 1,
    inference: bool = True,
    fit_gaussian: bool = True,
    apply_sigmoid: bool = True,
    balance_coefficient: float = 1.0,
    hm_hp_thresh: float = 0.1,
) -> Dict[str, jnp.ndarray]:
    """Decode raw head maps (NHWC, stride-4 grid) into top-K detections.

    Mirrors decode.py:72-375 with `Inference=True` extras when `inference`.
    All outputs are fixed-shape arrays keyed like the reference's detections dict.
    """
    heat = outputs["hm"]
    kps_map = outputs["hps"]
    b, h, w, _ = heat.shape
    j = kps_map.shape[-1] // 2

    if apply_sigmoid:
        heat = sigmoid_clamped(heat)
    heat_n = heat_nms(heat)
    scores, inds, clses, ys, xs = topk(heat_n, k)

    # Center + displacement keypoints [B, K, 2J] (x,y interleaved).
    kps = gather_feat(kps_map, inds)
    kps = kps.reshape(b, k, j, 2)
    kps = kps + jnp.stack([xs, ys], axis=-1)[:, :, None, :]

    if "reg" in outputs:
        reg = gather_feat(outputs["reg"], inds)
        xs_c = xs + reg[..., 0]
        ys_c = ys + reg[..., 1]
    else:
        xs_c, ys_c = xs + 0.5, ys + 0.5

    kps_displacement_mean = kps.reshape(b, k, 2 * j)

    if "wh" in outputs:
        wh = gather_feat(outputs["wh"], inds)
        bboxes = jnp.stack(
            [
                xs_c - wh[..., 0] / 2,
                ys_c - wh[..., 1] / 2,
                xs_c + wh[..., 0] / 2,
                ys_c + wh[..., 1] / 2,
            ],
            axis=-1,
        )
    else:
        bboxes = jnp.stack([xs_c, ys_c, xs_c, ys_c], axis=-1)

    kps_heatmap_mean = jnp.full((b, k, 2 * j), INVALID, jnp.float32)
    kps_heatmap_std = jnp.full((b, k, 2 * j), INVALID, jnp.float32)
    kps_heatmap_height = jnp.full((b, k, j), INVALID, jnp.float32)

    if "hm_hp" in outputs:
        hm_hp = outputs["hm_hp"]
        if apply_sigmoid:
            hm_hp = sigmoid_clamped(hm_hp)
        hm_hp_raw = hm_hp  # pre-NMS copy (decode.py:114 hm_hp_copy)
        hm_hp_n = heat_nms(hm_hp)

        kps_jk = kps.transpose(0, 2, 1, 3)  # [B, J, K, 2]
        hm_score, hm_inds, hm_ys, hm_xs = topk_channel(hm_hp_n, k)  # [B, J, K]

        if "hp_offset" in outputs:
            hp_off = gather_feat(
                outputs["hp_offset"], hm_inds.reshape(b, j * k)
            ).reshape(b, j, k, 2)
            hm_xs = hm_xs + hp_off[..., 0]
            hm_ys = hm_ys + hp_off[..., 1]
        else:
            hm_xs = hm_xs + 0.5
            hm_ys = hm_ys + 0.5

        # Threshold sentinels (decode.py:141-144).
        above = hm_score > hm_hp_thresh
        hm_score = jnp.where(above, hm_score, -1.0)
        hm_ys = jnp.where(above, hm_ys, INVALID)
        hm_xs = jnp.where(above, hm_xs, INVALID)

        # Nearest heatmap peak per displacement keypoint (decode.py:146-156).
        hm_xy = jnp.stack([hm_xs, hm_ys], axis=-1)  # [B, J, K, 2]
        dist = jnp.linalg.norm(
            kps_jk[:, :, :, None, :] - hm_xy[:, :, None, :, :], axis=-1
        )  # [B, J, K(det), K(peak)]
        min_ind = jnp.argmin(dist, axis=3)
        min_dist = jnp.take_along_axis(dist, min_ind[..., None], axis=3).squeeze(3)
        sel_score = jnp.take_along_axis(hm_score, min_ind.reshape(b, j, k), axis=2)
        sel_xy = jnp.take_along_axis(
            hm_xy, min_ind[..., None].repeat(2, -1), axis=2
        )  # [B, J, K, 2]

        # bbox gating (decode.py:158-173).
        l = bboxes[:, None, :, 0]
        t = bboxes[:, None, :, 1]
        r = bboxes[:, None, :, 2]
        bm = bboxes[:, None, :, 3]
        span = jnp.maximum(bm - t, r - l)
        bad = (
            (sel_xy[..., 0] < l)
            | (sel_xy[..., 0] > r)
            | (sel_xy[..., 1] < t)
            | (sel_xy[..., 1] > bm)
            | (sel_score < hm_hp_thresh)
            | (min_dist > span * 0.3)
        )
        if rep_mode == 3:
            blended = kps_jk
        elif rep_mode == 4:
            blended = sel_xy
        else:
            blended = jnp.where(bad[..., None], kps_jk, sel_xy)
        kps = blended.transpose(0, 2, 1, 3).reshape(b, k, 2 * j)

        if inference:
            # 7-condition validity mask (decode.py:183-188).
            scores_e = scores[:, None, :]  # [B, 1, K] broadcast over joints
            ok = (
                (sel_xy[..., 0] > 0.8 * l).astype(jnp.int32)
                + (sel_xy[..., 0] < 1.2 * r).astype(jnp.int32)
                + (sel_xy[..., 1] > 0.8 * t).astype(jnp.int32)
                + (sel_xy[..., 1] < 1.2 * bm).astype(jnp.int32)
                + (sel_score > hm_hp_thresh).astype(jnp.int32)
                + (min_dist < span * 0.5).astype(jnp.int32)
                + (scores_e > hm_hp_thresh).astype(jnp.int32)
            ) == 7
            xs_f = jnp.where(ok, sel_xy[..., 0], INVALID)
            ys_f = jnp.where(ok, sel_xy[..., 1], INVALID)

            if rep_mode in (1, 2):
                mean, std, height = _heatmap_gaussian_stats(
                    hm_hp_raw, xs_f, ys_f, ok, fit=fit_gaussian
                )
                kps_heatmap_mean = mean.transpose(0, 2, 1, 3).reshape(b, k, 2 * j)
                kps_heatmap_std = std.transpose(0, 2, 1, 3).reshape(b, k, 2 * j)
                kps_heatmap_height = height.transpose(0, 2, 1)
    else:
        kps = kps.reshape(b, k, 2 * j)

    def gathered(name, dim, transform=None):
        if name in outputs:
            v = gather_feat(outputs[name], inds)
            if transform is not None:
                v = transform(v)
            return v.reshape(b, k, dim)
        return jnp.zeros((b, k, dim), jnp.float32)

    # log-variance → std (decode.py:304-331).
    kps_displacement_std = gathered(
        "hps_uncertainty",
        2 * j,
        lambda v: jnp.sqrt(jnp.exp(v)) * balance_coefficient,
    )
    obj_scale = gathered("scale", 3)
    obj_scale_uncertainty = gathered(
        "scale_uncertainty", 3, lambda v: jnp.sqrt(jnp.exp(v))
    )
    tracking = gathered("tracking", 2)
    tracking_hp = gathered("tracking_hp", 2 * j)

    dets = {
        "bboxes": bboxes,
        "scores": scores[..., None],
        "kps": kps,
        "clses": clses[..., None].astype(jnp.float32),
        "obj_scale": obj_scale,
        "obj_scale_uncertainty": obj_scale_uncertainty,
        "tracking": tracking,
        "tracking_hp": tracking_hp,
        "kps_displacement_mean": kps_displacement_mean,
        "kps_displacement_std": kps_displacement_std,
    }
    if inference:
        dets.update(
            kps_heatmap_mean=kps_heatmap_mean,
            kps_heatmap_std=kps_heatmap_std,
            kps_heatmap_height=kps_heatmap_height,
        )
    return dets
