"""Modulated deformable convolution v2 (DCNv2) — TPU-native forward.

Semantics parity target: the reference's CUDA im2col sampler
(`src/lib/models/networks/DCNv2/src/cuda/dcn_v2_im2col_cuda.cu:166-189`, bilinear
weights `:60-80`) wrapped by `DCN` (`DCNv2/dcn_v2.py:97-128`):

  For each output pixel (h, w) and 3x3 tap t=(i, j) (row-major), the input is sampled
  at  p = (h*stride - pad + i*dil + dy[t],  w*stride - pad + j*dil + dx[t])
  with bilinear interpolation (out-of-bounds corners contribute 0), scaled by a
  sigmoid gate mask[t], then contracted against the conv weight.

  Offset channel layout (matters for weight conversion): the offset/mask conv emits
  3*k*k channels; channels [2t, 2t+1] are (dy, dx) of tap t and channels
  [2*k*k + t] are the mask logits (`dcn_v2.py:105-112` chunk+cat is a relabeling of
  exactly this interleaved layout).

TPU design — NOT a CUDA translation:
  * XLA path (default): all k*k taps' sample coordinates are built as one
    [B, H, W, k*k] tensor; 4 batched `take_along_axis` gathers over the flattened
    spatial dim fetch the bilinear corners for every tap at once; the modulated
    samples reshape to [B*H*W, k*k*C] and hit the MXU as a single matmul against the
    [k*k*C, Co] weight. XLA fuses the elementwise bilinear math into the gathers.
  * Gradients come for free through jnp ops (gathers and arithmetic are
    differentiable), so no hand-written backward is needed — unlike the reference's
    ~700-line col2im/coord-grad CUDA backward.

The production TPU serving path is the Pallas one-hot MXU sampler in
`centerpose_tpu/ops/dcn_onehot.py` (~9x at 512²/b32); this module is the exact
reference implementation, the training path, and the fallback for shapes the
Pallas kernels don't cover.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Batch-chunk size for memory-bounded DCN backward passes (NOTES_PERF round
# 2f): the reference CUDA backward loops per image; 4-image chunks bound one
# layer's backward transients to ~2G at 512². Shared by the in-model gather
# remat (models/layers.py) and dcn_v2_onehot's custom_vjp backward.
DCN_GRAD_CHUNK = 4


def _bilinear_gather(x_flat, py, px, h: int, w: int):
    """Bilinear sample of x_flat [B, H*W, C] at float coords py/px [B, N].

    Out-of-bounds corners contribute zero (CUDA sampler semantics).
    Returns [B, N, C].
    """
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = py - y0
    fx = px - x0

    def corner(yi, xi, wgt):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        idx = yc * w + xc  # [B, N]
        # Row-slice gather: advanced indexing lowers to lax.gather with a full-C
        # slice per index (one [1, C] slice per sample). take_along_axis with a
        # broadcast trailing dim degrades to per-ELEMENT gathers on TPU.
        vals = jax.vmap(lambda xf, ix: xf[ix])(x_flat, idx)
        return vals * (wgt * valid.astype(x_flat.dtype))[..., None]

    out = corner(y0, x0, (1 - fy) * (1 - fx))
    out += corner(y0, x0 + 1, (1 - fy) * fx)
    out += corner(y0 + 1, x0, fy * (1 - fx))
    out += corner(y0 + 1, x0 + 1, fy * fx)
    return out


def _bilinear_gather_packed(x, py, px, h: int, w: int):
    """Bilinear sample via ONE row gather per sample from a corner-packed map.

    TPU gathers are row-latency-bound: four separate [1, C] corner gathers per
    sample run ~4x slower than one [1, 4C] gather. We zero-pad x by one pixel on
    every side and pack each position's 2x2 corner block into the channel dim:
      packed[y, x] = [x[y-1,x-1], x[y-1,x], x[y,x-1], x[y,x]]  (padded coords)
    so corner (y0, x0) of a sample lives in packed[y0+1, x0+1] lane-block 0.

    Returns [B, N, C].
    """
    b = x.shape[0]
    c = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # [B, H+2, W+2, C]
    # corner blocks at packed position (i, j) = corners (i-1..i, j-1..j) of x:
    # take the 2x2 window whose top-left is (i, j) in padded coords.
    p00 = xp[:, : h + 1, : w + 1]
    p01 = xp[:, : h + 1, 1:]
    p10 = xp[:, 1:, : w + 1]
    p11 = xp[:, 1:, 1:]
    packed = jnp.concatenate([p00, p01, p10, p11], axis=-1)  # [B, H+1, W+1, 4C]
    hp, wp = h + 1, w + 1
    packed = packed.reshape(b, hp * wp, 4 * c)

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    fy = (py - y0)[..., None]
    fx = (px - x0)[..., None]
    yi = y0.astype(jnp.int32)
    xi = x0.astype(jnp.int32)
    yc = jnp.clip(yi + 1, 0, hp - 1)
    xc = jnp.clip(xi + 1, 0, wp - 1)
    # Samples whose BOTH corners are out of range contribute 0 (the ±1 border
    # cases are handled by the zero padding; only fully-out must be masked).
    far = (yi < -1) | (yi >= h) | (xi < -1) | (xi >= w)
    idx = yc * wp + xc

    rows = jax.vmap(lambda xf, ix: xf[ix])(packed, idx)  # [B, N, 4C]
    v00, v01, v10, v11 = jnp.split(rows, 4, axis=-1)
    out = (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )
    return jnp.where(far[..., None], 0.0, out)


@partial(
    jax.jit, static_argnames=("stride", "padding", "dilation", "packed_gather")
)
def dcn_v2(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    packed_gather: bool = True,
) -> jnp.ndarray:
    """Modulated deformable conv v2 forward.

    Args:
      x:      [B, H, W, C]  input feature map (NHWC).
      offset: [B, Ho, Wo, 2*kh*kw]  interleaved (dy, dx) per tap, row-major taps.
      mask:   [B, Ho, Wo, kh*kw]  post-sigmoid modulation gates.
      weight: [kh, kw, C, Co]  conv weight (HWIO).
      bias:   [Co].

    Returns [B, Ho, Wo, Co].
    """
    b, h, w, c = x.shape
    kh, kw, _, co = weight.shape
    ho, wo = offset.shape[1], offset.shape[2]
    kk = kh * kw
    dtype = x.dtype

    # Base sampling grid per output pixel and tap.
    oy = jnp.arange(ho, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(wo, dtype=jnp.float32) * stride - padding
    ty = jnp.arange(kh, dtype=jnp.float32) * dilation  # tap row offsets
    tx = jnp.arange(kw, dtype=jnp.float32)

    off = offset.reshape(b, ho, wo, kk, 2).astype(jnp.float32)
    base_y = oy[None, :, None, None] + jnp.repeat(ty, kw)[None, None, None, :]
    base_x = ox[None, None, :, None] + jnp.tile(tx * dilation, kh)[None, None, None, :]
    py = (base_y + off[..., 0]).reshape(b, ho * wo * kk)
    px = (base_x + off[..., 1]).reshape(b, ho * wo * kk)

    if packed_gather:
        samples = _bilinear_gather_packed(x, py, px, h, w)  # [B, N*kk, C]
    else:
        samples = _bilinear_gather(x.reshape(b, h * w, c), py, px, h, w)
    samples = samples.reshape(b, ho * wo, kk, c)
    samples = samples * mask.reshape(b, ho * wo, kk, 1).astype(dtype)

    # One big MXU matmul: [B*N, kk*C] @ [kk*C, Co].
    cols = samples.reshape(b * ho * wo, kk * c)
    w_mat = weight.transpose(0, 1, 2, 3).reshape(kk * c, co).astype(dtype)
    out = jnp.dot(cols, w_mat, preferred_element_type=jnp.float32)
    out = out.astype(dtype) + bias.astype(dtype)
    return out.reshape(b, ho, wo, co)
