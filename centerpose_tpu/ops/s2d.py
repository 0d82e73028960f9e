"""Exact space-to-depth (S2D) rewrites of stride-1 convolutions.

Why: the DLA stem chain (7x7 s1 3->16 @512^2, level0 3x3 s1 16->16 @512^2,
level1 3x3 s2 16->32) runs at <5% MXU utilization on TPU — C=16 fills 16 of
the 128 output lanes and the full-res activations pay padded-lane HBM traffic
(measured 10.8 ms of an 80 ms b32 step, NOTES_PERF round 2g). Folding f x f
spatial blocks into channels (512^2 x16 -> 256^2 x64) makes the same math
MXU-shaped. The transform is EXACT: the S2D kernel below is a scatter of the
original weights (zero-filled elsewhere), so outputs match the plain conv up
to fp reassociation.

Derivation (f=2, stride-1 conv, kernel k = 2r+1): with
  x_t[i, j, (di, dj, c)] = x[f*i + di, f*j + dj, c]
the output pixel (f*i+di, f*j+dj) reads input rows f*i+di+u (|u| <= r); writing
f*i+di+u = f*(i+p)+q gives u = f*p + q - di, so in S2D space the conv has taps
p in [-P, P], P = ceil((r+f-1)/f), and transformed kernel

  W_t[P+p, P+p', (q,q',c), (di,dj,co)] = W[r+u, r+v, c, co]   (u,v valid)

A stride-f conv consuming the S2D layout and producing the NORMAL downsampled
grid ("exit conv", 3x3 s2 pad1 -> 2x2 s1 pad[(1,0),(1,0)]) lets a whole chain
run in S2D layout with a single un-transform at the end.

No reference-file analogue: this is a TPU-layout optimization of the stem
defined at pose_dla_dcn.py:234-246 — parity is asserted against the plain
path in tests/test_s2d.py and via the torch parity suite.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/f, W/f, f*f*C]; channel index = (di, dj, c)."""
    b, h, w, c = x.shape
    assert h % f == 0 and w % f == 0, (h, w, f)
    return (
        x.reshape(b, h // f, f, w // f, f, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // f, w // f, f * f * c)
    )


def depth_to_space(x: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    """Inverse of space_to_depth: [B, H, W, f*f*C] -> [B, f*H, f*W, C]."""
    b, h, w, c4 = x.shape
    c = c4 // (f * f)
    return (
        x.reshape(b, h, w, f, f, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h * f, w * f, c)
    )


def _tap_maps(k: int, f: int, taps, subs):
    """Static index/validity maps: for each (tap a, q, d) the original kernel
    row r+u it reads, and whether u is in range."""
    r = (k - 1) // 2
    idx = np.zeros((len(taps), f, f), np.int32)
    ok = np.zeros((len(taps), f, f), bool)
    for ai, p in enumerate(taps):
        for q in range(f):
            for d in subs:
                u = f * p + q - d
                if abs(u) <= r:
                    idx[ai, q, d] = r + u
                    ok[ai, q, d] = True
    return idx, ok


def s2d_conv_kernel(w: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    """[k, k, ci, co] s1 kernel -> [kt, kt, f*f*ci, f*f*co] S2D-layout kernel."""
    k, _, ci, co = w.shape
    r = (k - 1) // 2
    P = (r + f - 1) // f
    taps = list(range(-P, P + 1))
    idx, ok = _tap_maps(k, f, taps, range(f))
    # Gather rows then columns; zero the out-of-range taps.
    t = w[jnp.asarray(idx)]                      # [kt, q, di, k, ci, co]
    t = t[:, :, :, jnp.asarray(idx)]             # [kt, q, di, kt, qq, dj, ci, co]
    mask = jnp.asarray(
        ok[:, :, :, None, None, None] & ok[None, None, None, :, :, :]
    )
    t = jnp.where(mask[..., None, None], t, 0)
    # -> [kt(a), kt(b), q, qq, ci, di, dj, co] -> [kt, kt, f*f*ci, f*f*co]
    t = t.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    return t.reshape(2 * P + 1, 2 * P + 1, f * f * ci, f * f * co)


def s2d_exit_kernel(w: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    """[3, 3, ci, co] stride-2 pad-1 kernel -> [2, 2, f*f*ci, co] stride-1
    kernel over the S2D layout with padding [(1, 0), (1, 0)], producing the
    normal (non-S2D) stride-2 output grid. f=2 only."""
    assert f == 2 and w.shape[0] == 3 and w.shape[1] == 3, w.shape
    ci, co = w.shape[2], w.shape[3]
    idx, ok = _tap_maps(3, f, [-1, 0], [0])      # output sub-position d = 0
    idx, ok = idx[:, :, 0], ok[:, :, 0]          # [2 taps, q]
    t = w[jnp.asarray(idx)]                      # [2, q, 3, ci, co]
    t = t[:, :, jnp.asarray(idx)]                # [2, q, 2, qq, ci, co]
    mask = jnp.asarray(ok[:, :, None, None] & ok[None, None, :, :])
    t = jnp.where(mask[..., None, None], t, 0)
    t = t.transpose(0, 2, 1, 3, 4, 5)            # [2, 2, q, qq, ci, co]
    return t.reshape(2, 2, f * f * ci, co)


def s2d_padding(k: int, f: int = 2):
    """SAME-equivalent padding for the transformed s1 kernel."""
    P = ((k - 1) // 2 + f - 1) // f
    return [(P, P), (P, P)]
