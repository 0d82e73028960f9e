"""Deformable position-sensitive ROI pooling (DCNv2Pooling) — TPU-native.

Parity target: the reference DCNv2 extension's second op,
`dcn_v2_psroi_pooling_forward` (/root/reference/src/lib/models/networks/DCNv2/
src/cpu/dcn_v2_psroi_pooling_cpu.cpp:58-146 and the `DCNv2Pooling` module in
DCNv2/dcn_v2.py:187-221). No CenterPose model uses it (SURVEY §2.1), but it is
part of the native extension's public surface, so the framework provides it.

Semantics (per output element (n, ctop, ph, pw)):
  * ROI corners are rounded to integers, scaled by `spatial_scale`, shifted
    by -0.5, with the end corner inclusive (+1 before scaling); width/height
    floored at 0.1.
  * The (ph, pw) bin starts at roi_start + bin_size*index, displaced by a
    learned normalized offset trans[n, class_id*2(+1), part_h, part_w] *
    trans_std * roi_size (the "deformable" part; zero when `trans is None`).
  * `sample_per_part`² sub-samples are bilinearly interpolated from the
    position-sensitive input channel c = (ctop*group_size + gh)*group_size
    + gw, where (gh, gw) select the group cell of the bin; samples outside
    [-0.5, dim-0.5] are excluded from the average, in-range ones clamp to
    [0, dim-1].
  * Output = masked mean (0 where no sample lands in range).

TPU design: everything is one fused XLA program — a `vmap` over ROIs around
dense [O, P, P, S, S] sample grids gathered with a single flattened
`jnp.take`. Fixed shapes (N rois, P bins, S samples) keep it jit-stable;
the backward pass is plain autodiff (gathers transpose to scatter-adds, fine
at ROI-pooling sizes — this op is orders of magnitude smaller than the DCN
conv path).

Layout: NHWC input [B, H, W, C_in] with C_in = output_dim * group_size².
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(
    jax.jit,
    static_argnames=(
        "spatial_scale",
        "pooled_size",
        "output_dim",
        "group_size",
        "part_size",
        "sample_per_part",
        "trans_std",
    ),
)
def dcn_v2_psroi_pooling(
    x: jnp.ndarray,
    rois: jnp.ndarray,
    trans: Optional[jnp.ndarray] = None,
    *,
    spatial_scale: float,
    pooled_size: int,
    output_dim: int,
    group_size: int = 1,
    part_size: Optional[int] = None,
    sample_per_part: int = 4,
    trans_std: float = 0.0,
):
    """Returns [N, pooled_size, pooled_size, output_dim] pooled features.

    x:     [B, H, W, C_in] features, C_in == output_dim * group_size**2.
    rois:  [N, 5] rows of (batch_index, x1, y1, x2, y2) in image coordinates.
    trans: [N, 2*num_classes, part_size, part_size] normalized offsets, or
           None for the no_trans path.
    """
    B, H, W, C = x.shape
    P = pooled_size
    S = sample_per_part
    ps = P if part_size is None else part_size
    if C != output_dim * group_size * group_size:
        raise ValueError(
            f"C_in={C} != output_dim*group_size^2="
            f"{output_dim * group_size * group_size}"
        )
    if trans is None:
        num_classes = 1
    else:
        num_classes = trans.shape[1] // 2
    channels_each_class = output_dim // num_classes

    dtype = x.dtype
    fdtype = jnp.promote_types(dtype, jnp.float32)
    x = x.astype(fdtype)

    # Static per-bin index tables.
    ph = jnp.arange(P)
    part_h = jnp.clip((ph * ps) // P, 0, ps - 1)  # floor(ph/P*ps), exact ints
    gh = jnp.clip((ph * group_size) // P, 0, group_size - 1)
    ctop = jnp.arange(output_dim)
    class_id = ctop // channels_each_class
    # Position-sensitive channel per (ctop, ph_bin, pw_bin); gw shares gh's
    # formula (square pooling).
    gw = gh
    c_idx = (
        (ctop[:, None, None] * group_size + gh[None, :, None]) * group_size
        + gw[None, None, :]
    )  # [O, P, P]

    def _round_c(v):
        # C round(): half away from zero (dcn_v2_psroi_pooling_cuda.cu uses
        # round() on the ROI corners); jnp.round is half-to-even and differs
        # on exact .5 coordinates.
        return jnp.sign(v) * jnp.floor(jnp.abs(v) + 0.5)

    def pool_one(roi, tr):
        b = roi[0].astype(jnp.int32)
        x1, y1, x2, y2 = roi[1], roi[2], roi[3], roi[4]
        roi_start_w = _round_c(x1) * spatial_scale - 0.5
        roi_start_h = _round_c(y1) * spatial_scale - 0.5
        roi_end_w = (_round_c(x2) + 1.0) * spatial_scale - 0.5
        roi_end_h = (_round_c(y2) + 1.0) * spatial_scale - 0.5
        roi_w = jnp.maximum(roi_end_w - roi_start_w, 0.1)
        roi_h = jnp.maximum(roi_end_h - roi_start_h, 0.1)
        bin_w = roi_w / P
        bin_h = roi_h / P
        sub_w = bin_w / S
        sub_h = bin_h / S

        if trans is None:
            trans_x = jnp.zeros((output_dim, P, P), fdtype)
            trans_y = jnp.zeros((output_dim, P, P), fdtype)
        else:
            # tr: [2*num_classes, ps, ps] -> per (ctop, ph, pw).
            tx = tr[class_id * 2]  # [O, ps, ps]
            ty = tr[class_id * 2 + 1]
            trans_x = tx[:, part_h][:, :, part_h] * trans_std  # [O, P, P]
            trans_y = ty[:, part_h][:, :, part_h] * trans_std

        wstart = (
            jnp.arange(P, dtype=fdtype)[None, None, :] * bin_w
            + roi_start_w
            + trans_x * roi_w
        )  # [O, P, P]
        hstart = (
            jnp.arange(P, dtype=fdtype)[None, :, None] * bin_h
            + roi_start_h
            + trans_y * roi_h
        )

        iw = jnp.arange(S, dtype=fdtype)
        ws = wstart[..., None, None] + iw[None, None, None, None, :] * sub_w
        hs = hstart[..., None, None] + iw[None, None, None, :, None] * sub_h
        # [O, P, P, S, S]
        valid = (
            (ws >= -0.5) & (ws <= W - 0.5) & (hs >= -0.5) & (hs <= H - 0.5)
        )
        wc = jnp.clip(ws, 0.0, W - 1.0)
        hc = jnp.clip(hs, 0.0, H - 1.0)
        x0 = jnp.floor(wc)
        y0 = jnp.floor(hc)
        dx = wc - x0
        dy = hc - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, W - 1)
        y1i = jnp.minimum(y0i + 1, H - 1)

        flat = jnp.take(x, b, axis=0).reshape(-1)  # [H*W*C]
        cc = c_idx[..., None, None]  # [O, P, P, 1, 1]

        def at(yi, xi):
            return jnp.take(flat, (yi * W + xi) * C + cc, mode="clip")

        v00 = at(y0i, x0i)
        v01 = at(y1i, x0i)
        v10 = at(y0i, x1i)
        v11 = at(y1i, x1i)
        val = (
            (1 - dx) * (1 - dy) * v00
            + (1 - dx) * dy * v01
            + dx * (1 - dy) * v10
            + dx * dy * v11
        )
        val = jnp.where(valid, val, 0.0)
        cnt = valid.sum(axis=(-1, -2)).astype(fdtype)  # [O, P, P]
        total = val.sum(axis=(-1, -2))
        out = jnp.where(cnt > 0, total / jnp.maximum(cnt, 1.0), 0.0)
        return jnp.transpose(out, (1, 2, 0))  # [P, P, O]

    if trans is None:
        pooled = jax.vmap(lambda r: pool_one(r, None))(rois.astype(fdtype))
    else:
        pooled = jax.vmap(pool_one)(rois.astype(fdtype), trans.astype(fdtype))
    return pooled.astype(dtype)
