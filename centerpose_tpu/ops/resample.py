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


def preprocess_on_device(
    images: Sequence[np.ndarray],
    inv_transforms: Sequence[np.ndarray],
    out_h: int,
    out_w: int,
) -> jnp.ndarray:
    """Warp+normalize a list of equal-shape images into one [N, out_h, out_w, 3]
    batch on device (images of differing shapes fall back to per-image calls)."""
    shapes = {im.shape for im in images}
    if len(shapes) == 1:
        batch = jnp.asarray(np.stack(images))
        invs = jnp.asarray(np.stack(inv_transforms).astype(np.float32))
        return jax.vmap(
            lambda im, t: warp_affine_device(im, t, out_h, out_w)
        )(batch, invs)
    return jnp.stack(
        [
            warp_affine_device(jnp.asarray(im), jnp.asarray(t, jnp.float32), out_h, out_w)
            for im, t in zip(images, inv_transforms)
        ]
    )
