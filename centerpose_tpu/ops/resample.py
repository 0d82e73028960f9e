"""On-device affine warping (the jnp twin of geometry/affine.warp_affine).

The reference preprocesses on the CPU (cv2.resize + cv2.warpAffine,
base_detector.py:127-133); at serving scale that host stage dominates. This module
does the crop-resize-normalize on the TPU: a batched bilinear sampler over the
affine-transformed coordinate grid, fused with the mean/std normalization into one
jitted program.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from centerpose_tpu.config import DATA_MEAN, DATA_STD


@partial(jax.jit, static_argnames=("out_h", "out_w", "normalize"))
def warp_affine_device(
    image: jnp.ndarray,
    inv_transform: jnp.ndarray,
    out_h: int,
    out_w: int,
    normalize: bool = True,
) -> jnp.ndarray:
    """Bilinear-warp an [H, W, 3] uint8/float image by a 2x3 affine (dst→src
    mapping), optionally fusing /255 + mean/std normalization.

    `inv_transform` maps OUTPUT pixel coords to SOURCE coords (pass the
    inv=True transform from geometry.affine.get_affine_transform).
    """
    h, w = image.shape[:2]
    img = image.astype(jnp.float32)

    ys = jnp.arange(out_h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    src_x = inv_transform[0, 0] * xs + inv_transform[0, 1] * ys + inv_transform[0, 2]
    src_y = inv_transform[1, 0] * xs + inv_transform[1, 1] * ys + inv_transform[1, 2]

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = (src_x - x0)[..., None]
    fy = (src_y - y0)[..., None]

    flat = img.reshape(h * w, -1)

    def corner(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = (
            jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w
            + jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        )
        return flat[idx] * valid[..., None]

    out = (
        corner(y0, x0) * (1 - fy) * (1 - fx)
        + corner(y0, x0 + 1) * (1 - fy) * fx
        + corner(y0 + 1, x0) * fy * (1 - fx)
        + corner(y0 + 1, x0 + 1) * fy * fx
    )
    if normalize:
        mean = jnp.asarray(DATA_MEAN, jnp.float32)
        std = jnp.asarray(DATA_STD, jnp.float32)
        out = (out / 255.0 - mean) / std
    return out


def axis_aligned(inv_transforms: Sequence[np.ndarray], tol: float = 1e-9) -> bool:
    """True iff every 2x3 dst→src affine has no rotation/shear component.

    Serving transforms (center crop + scale, rot=0 — base_detector.py:127-133)
    are always axis-aligned; only rotation augmentation during training makes
    them not."""
    return all(
        abs(float(t[0, 1])) <= tol and abs(float(t[1, 0])) <= tol
        for t in inv_transforms
    )


def _hat_weights(scale, shift, out_n: int, in_n: int) -> jnp.ndarray:
    """[B, out_n, in_n] separable bilinear weights: W[b, o, i] =
    max(0, 1 - |scale[b]*o + shift[b] - i|). Rows whose source coordinate
    falls outside [-1, in_n] are all-zero — identical zero-border semantics
    to the masked-corner gather path in `warp_affine_device`."""
    src = scale[:, None] * jnp.arange(out_n, dtype=jnp.float32)[None, :] \
        + shift[:, None]                                   # [B, out_n]
    d = jnp.abs(src[:, :, None] - jnp.arange(in_n, dtype=jnp.float32))
    return jnp.maximum(0.0, 1.0 - d)                       # [B, out_n, in_n]


@partial(jax.jit, static_argnames=("out_h", "out_w", "normalize"))
def warp_separable_batch(
    images: jnp.ndarray,
    transforms: jnp.ndarray,
    out_h: int,
    out_w: int,
    normalize: bool = True,
) -> jnp.ndarray:
    """Axis-aligned batched warp as two MXU matmuls (the TPU-native resize).

    For transforms with zero rotation/shear the bilinear warp factorizes into
    per-axis hat-function weight matrices: out = Wy @ img @ Wx^T per channel.
    XLA maps both contractions onto the MXU — ~75x faster than the 4-corner
    gather formulation at b32 512² on v5e (gathers don't tile; NOTES_PERF
    round 4c). `transforms` are the same dst→src 2x3 affines
    `warp_affine_device` takes; rows [0,1]/[1,0] are assumed zero.
    """
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    img = images.astype(jnp.float32)
    wy = _hat_weights(transforms[:, 1, 1], transforms[:, 1, 2], out_h, h)
    wx = _hat_weights(transforms[:, 0, 0], transforms[:, 0, 2], out_w, w)
    # [B,out_h,H] @ [B,H,W*C] -> [B,out_h,W*C]; then contract W with Wx.
    tmp = jax.lax.batch_matmul(
        wy, img.reshape(b, h, -1), precision=jax.lax.Precision.HIGHEST
    ).reshape(b, out_h, w, -1)
    out = jnp.einsum(
        "bow,bhwc->bhoc", wx, tmp, precision=jax.lax.Precision.HIGHEST
    )
    if normalize:
        mean = jnp.asarray(DATA_MEAN, jnp.float32)
        std = jnp.asarray(DATA_STD, jnp.float32)
        out = (out / 255.0 - mean) / std
    return out


# The separable path materializes an f32 copy of the source batch plus dense
# [B, out, in] weight matrices — HBM grows with SOURCE resolution (b32 1080p
# ≈ 1.8 GB before network activations; ADVICE r4 #3). Above this source-pixel
# budget (≈ 0.8 GB of f32 source copy, b64@512² / b16@1024² territory) fall
# back to the 4-corner gather warp, whose footprint scales with OUTPUT size.
_SEPARABLE_SRC_PIXEL_BUDGET = 64 * 512 * 512


def warp_axis_aligned_batch(
    images: jnp.ndarray,
    transforms: jnp.ndarray,
    out_h: int,
    out_w: int,
    normalize: bool = True,
) -> jnp.ndarray:
    """Batched axis-aligned warp: the separable MXU formulation when the
    source batch fits the HBM budget, the gather formulation otherwise.
    Both have identical hat-weight + zero-border semantics (tested)."""
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    if b * h * w <= _SEPARABLE_SRC_PIXEL_BUDGET:
        return warp_separable_batch(images, transforms, out_h, out_w, normalize)
    return jax.vmap(
        lambda im, t: warp_affine_device(im, t, out_h, out_w, normalize)
    )(images, transforms)


def preprocess_on_device(
    images: Sequence[np.ndarray],
    inv_transforms: Sequence[np.ndarray],
    out_h: int,
    out_w: int,
) -> jnp.ndarray:
    """Warp+normalize a list of equal-shape images into one [N, out_h, out_w, 3]
    batch on device (images of differing shapes fall back to per-image calls).
    Axis-aligned transform sets (all serving paths) take the separable-matmul
    warp; rotated ones the gather warp."""
    shapes = {im.shape for im in images}
    if len(shapes) == 1:
        batch = jnp.asarray(np.stack(images))
        invs = jnp.asarray(np.stack(inv_transforms).astype(np.float32))
        if axis_aligned(inv_transforms):
            return warp_axis_aligned_batch(batch, invs, out_h, out_w)
        return jax.vmap(
            lambda im, t: warp_affine_device(im, t, out_h, out_w)
        )(batch, invs)
    return jnp.stack(
        [
            warp_affine_device(jnp.asarray(im), jnp.asarray(t, jnp.float32), out_h, out_w)
            for im, t in zip(images, inv_transforms)
        ]
    )
