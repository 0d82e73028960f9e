"""Pallas TPU kernels: one-hot MXU samplers for DCNv2 (3x3, s1, p1, d1).

Semantics parity target: the reference CUDA im2col sampler
(src/lib/models/networks/DCNv2/src/cuda/dcn_v2_im2col_cuda.cu:166-189), like
ops/dcn.py. The production exact=False path routes to `_grouped_kernel`
(MXU-packed, samples EVERY offset exactly — data-adaptive loop bounds over the
full height). The residual `_row_kernel` path (exact=True, or shapes neither
packing fits) restricts sampling to a ±R input-row window around each block of
output rows: taps whose vertical offset exceeds R contribute ZERO (they are
not clamped); for |dy| <= R it matches the exact op including all
image-boundary cases.

Why this beats the XLA gather (NOTES_PERF.md): TPU gathers are row-latency-bound
(~70 GB/s effective). Here bilinear sampling is re-expressed as matmuls against
on-the-fly one-hot selectors, so the sampling rides the MXU:

  grid = (B, H/G): one program per (batch item, block of G output rows). The
  full [H, 2C, W+1] feature map for batch b stays VMEM-resident across the row
  sweep (block index constant in r ⇒ fetched once per batch item). Blocking G
  rows shares the (G + 2R + 2)-row input window across all G rows' samples —
  MXU work per row shrinks by G·(2R+3)/(G+2R+2) vs one-row programs.

Layout ("transposed-S"): samples live on LANES, lane = t·GW + g·W + w
(tap major, then row-of-block, then column — so the final conv slices ONE
[C, G·W] lane block per tap: 9 output matmuls per program independent of G).
All per-sample scalars are [1, G·9W] lane vectors — every broadcast is a free
sublane replication; no in-kernel transposes:

  ohT[x', s]  = (x' == x0[s] + 1)          # [W+1, GS] pure 0/1, bf16-exact
  sT          = cat(rho) @ ohT             # ONE [2C, W+1]x[W+1, GS] MXU matmul
                                           # per window row; cat = [x>>1 | x]ᵀ
                                           # with a zero column at x'=W, so
                                           # rows [:C] give corner x0 and [C:]
                                           # corner x0+1, and BOTH image-edge
                                           # cases fall out automatically
  bx          = s0·(1-fx) + s1·fx          # f32 VPU blend (fx never quantized)
  acc        += ((rho==ly)·(1-fy) + (rho==ly+1)·fy) · bx     # y blend
  outT        = Σ_t W[t]ᵀ @ (mask·acc)[:, t·GW:(t+1)·GW]     # [Co, G·W]

The kernel emits [B, H, Co, W]; the caller transposes back to NHWC (an XLA
transpose, fused with the bias add).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from centerpose_tpu.ops.dcn import DCN_GRAD_CHUNK, dcn_v2


def _pick_block_rows(h: int, w: int, c: int, radius: int,
                     itemsize: int = 2, mrows: int = None,
                     co: int = 0) -> int:
    """Row-blocking G: per-program fixed overhead (~5 µs: grid dispatch, loop
    machinery, cross-lane reductions) dominates the sampling MACs by 10x at
    G=2 (measured round 2: 75 MMAC ≈ 0.4 µs vs ~5 µs overhead), so larger
    blocks win even though every window-row matmul multiplies all G rows'
    samples (window rows grow as G+2 adaptive). Pick the largest G with the
    window inside H, G | H, and kernel live buffers within VMEM (~16 MB/core:
    one-hot [W, G·9W] + accumulators [C, G·9W] x2 + the resident feature map)."""
    mrows = 2 * c if mrows is None else mrows
    # Measured on v5e (NOTES_PERF round 2): per-program overhead argues for
    # large G, but VPU/selector work and register pressure grow with G·W, so
    # the sweet spot scales inversely with the map: G ≈ 512 / H (128²→4,
    # 64²→8, 32²→16), small maps capped at 4.
    best = max(1, min(16, 512 // max(h, 1))) if h > 16 else 4
    for g in (16, 8, 4, 2, 1):
        if g > best or h % g != 0 or g > h:
            continue
        gs = g * 9 * w
        # Kernel-live bytes: column iota [W, GS] i32 + one-hot [W, GS] +
        # f32 matmul output [C, GS] + acc [C, GS] (compute dtype) +
        # double-buffered feature map. (Tracks the Mosaic scoped-vmem report
        # within ~1%; the hard limit is 16M.)
        live = (
            w * gs * (4 + itemsize)
            + c * gs * (4 + itemsize)
            + 2 * h * mrows * w * itemsize
        )
        if itemsize >= 4:
            # f32 runs OOM'd the scoped-vmem stack with the bf16-calibrated
            # model (measured: h=32 c=256 g=16 → 17.38M vs the 16M limit).
            # Count the un-reused f32 blend temp, the weights, and the
            # double-buffered output block as well.
            live += c * gs * 4 + 9 * c * max(co, c) * itemsize + 2 * co * gs // 9 * 4
        if live <= 15 * 1024 * 1024:
            return g
    return 1


def _row_kernel(dym_ref, idx_ref, x_ref, w_ref, out_ref, *,
                h: int, w: int, c: int, co: int, radius: int, g: int,
                exact: bool):
    rb = pl.program_id(1)
    # Window clamped to the image: when G + 2R + 2 >= H every program sees the
    # whole height (r0 = 0) and the windowed op degenerates to the EXACT op.
    rw = min(g + 2 * radius + 2, h)
    r0 = jnp.clip(rb * g - 1 - radius, 0, h - rw)
    gs = g * 9 * w

    dy = dym_ref[0, 0, 0:1]   # [1, GS] f32, lane = g·9W + t·W + w
    dx = dym_ref[0, 0, 1:2]
    m = dym_ref[0, 0, 2:3]
    row_in_blk = idx_ref[0:1, :]   # precomputed lane decodes (f32 constants)
    t_row = idx_ref[1:2, :]
    t_col = idx_ref[2:3, :]
    w_pos = idx_ref[3:4, :]

    py = (rb * g - 1).astype(jnp.float32) + row_in_blk + t_row + dy
    px = (w_pos - 1.0) + t_col + dx
    y0 = jnp.floor(py)
    fy = py - y0
    x0 = jnp.floor(px)
    fx = px - x0
    ly = y0 - r0.astype(jnp.float32)     # window row of the upper corner
    x1 = x0 + 1.0                        # right-corner column in [0, W]

    if exact:
        # 0/1 one-hot on the RIGHT corner only; both corners come from the
        # [x>>1 | x] channel-concat (M = 2C) and fx blends in f32 on the VPU.
        # Clamp before the cast so huge offsets can't overflow int32.
        # (i8 iota/compares are not supported by this Mosaic.)
        x1c = jnp.clip(x1, -1.0, float(w + 1))
        x1i = jnp.where((x1 >= 0.0) & (x1 < w), x1c, -1.0).astype(jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (w, gs), 0)
        oht = (rows == x1i).astype(x_ref.dtype)         # [W, GS]
        # Right-edge case: x1 == W has no one-hot column, but the LEFT corner
        # x0 == W-1 is in-bounds with weight (1-fx). Its value is the last
        # column of the unshifted half — a sublane vector here, so the fix-up
        # is a cheap outer-product broadcast.
        edge = (x1 == w).astype(jnp.float32) * (1.0 - fx)   # [1, GS]
    else:
        # Bilinear x-weights INSIDE the (bf16) selector: the weight column x'
        # receives is EXACTLY the hat function max(0, 1 - |x' - px|) — for
        # in-range px it places (1-fx, fx) on (x0, x1), and at the image edge
        # the out-of-range corner is zero-padded so the hat's value on the
        # surviving column is already that corner's full bilinear weight.
        # 3 VPU ops over [W, GS], no compares/int casts. fx quantizes to the
        # compute dtype (<= 2^-9 relative — below bf16 activation noise).
        # (Mosaic iota is integer-only; convert.)
        rows_f = jax.lax.broadcasted_iota(jnp.int32, (w, gs), 0).astype(
            jnp.float32
        )
        pxc = jnp.clip(px, -2.0, float(w + 1))          # keep |diff| finite
        oht = jnp.maximum(1.0 - jnp.abs(rows_f - pxc), 0.0).astype(x_ref.dtype)

    # Post-matmul blend dtype: bf16 inputs stay bf16 end to end (halves the
    # [C, GS] st/acc VMEM, unblocking larger G; y/x blend weights quantize to
    # <= 2^-8 relative — the same order as the weighted-selector fx path).
    acc_dt = x_ref.dtype if x_ref.dtype == jnp.bfloat16 else jnp.float32

    def body(rho, acc):
        xrow = x_ref[0, r0 + rho]                       # [2C, W] or [C, W]
        st = jax.lax.dot_general(
            xrow, oht, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,         # Mosaic: acc is 32-bit
        ).astype(acc_dt)                                # [2C or C, GS]
        if exact:
            bx = st[:c] * (1.0 - fx).astype(acc_dt) + st[c:] * fx.astype(acc_dt)
            bx = bx + xrow[c:, w - 1:w].astype(acc_dt) * edge.astype(acc_dt)
        else:
            bx = st
        rho_f = rho.astype(jnp.float32)
        a = (
            (ly == rho_f).astype(jnp.float32) * (1.0 - fy)
            + (ly == rho_f - 1.0).astype(jnp.float32) * fy
        )
        return acc + a.astype(acc_dt) * bx

    # Data-adaptive bounds: only window rows in [min(ly), max(ly)+1] carry any
    # bilinear weight — at zero/small offsets (trained DCNs concentrate near
    # 0; at init offsets are exactly 0) this shrinks G+2R+2 iterations to ~G+2.
    lo = jnp.min(jnp.clip(ly, 0.0, float(rw))).astype(jnp.int32)
    # Integer offsets (fy == 0 — exactly the at-init case) put zero weight on
    # the lower corner row: the bound is ly+1, not ly+2.
    up = jnp.where(fy > 0.0, 2.0, 1.0)
    hi = jnp.max(jnp.clip(ly + up, 0.0, float(rw))).astype(jnp.int32)
    hi = jnp.maximum(hi, lo)
    acc = jax.lax.fori_loop(lo, hi, body, jnp.zeros((c, gs), acc_dt))
    acc = (acc * m.astype(acc_dt)).astype(w_ref.dtype)  # [C, GS]

    # Tap-major lanes ⇒ the output conv is 9 matmuls of [Co, C] x [C, G·W]
    # regardless of G (the old row-major layout needed 9·G small matmuls).
    gw = g * w
    out = jnp.zeros((co, gw), jnp.float32)
    for t in range(9):
        out = out + jax.lax.dot_general(
            w_ref[t], acc[:, t * gw:(t + 1) * gw], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # [Co, G·W]
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _pick_grouped_block_rows(h: int, w: int, c: int, co: int, nr: int,
                             mp: int, itemsize: int) -> int:
    """Row-blocking G for `_grouped_kernel` (v5e sweep, zero offsets, bf16):
    the M/K packings remove the per-row VPU blends, so the optimum shifts to
    SMALLER blocks than the row-sweep kernel's G≈512/H — adaptive iterations
    scale as (G+2)/(nr or mp) and per-program overhead is low. Measured:
    128²→2 (6.2 ms vs 7.5 at G=4), 64²→4 (2.4 vs 2.9 at 8), 32²→8 (1.5 vs
    1.6 at 16), 16²→16 (1.4, whole image). That is G≈2 for the M-paired path
    and G≈256/H for the K-folded path, shrunk if the kernel-live VMEM estimate
    overflows the 16M scoped budget."""
    if mp >= 2:
        best = 2
    else:
        best = max(1, min(h, 256 // max(h, 1)))
    g = best
    while g > 1 and h % g:
        g -= 1
    acc_it = itemsize if itemsize == 2 else 4
    while g > 1:
        gs = g * 9 * w
        live = (
            w * gs * 8                            # iota f32 + x-hat f32
            + (128 * gs * itemsize if nr > 1 else 0)   # folded selector
            + mp * c * gs * 4                     # dot output (f32)
            + c * gs * acc_it                     # accumulator
            + 2 * h * c * w * itemsize            # resident feature map
            + 9 * c * co * itemsize
            + 2 * co * gs // 9 * 4
        )
        if live <= 15 * 1024 * 1024:
            break
        g //= 2
        while g > 1 and h % g:
            g -= 1
    return g


def _grouped_kernel(dym_ref, idx_ref, bnd_ref, dbase_ref, x_ref, w_ref,
                    out_ref, *,
                    h: int, w: int, c: int, co: int, g: int, nr: int, mp: int):
    """MXU-packed variant of `_row_kernel` (exact bilinear for ANY |dy|).

    Two packings fix the MXU under-utilization of the row-sweep kernel:

    * nr > 1 (small maps, W < 128): nr = 128/W window rows fold into the
      matmul K dimension; the y-hat weight rides INSIDE the selector
      (sel[(r,x'), s] = hatY(r)·hatX(x')), so K is a full 128 lanes (the
      row-sweep pads K=W up to a 128 block, idling (128-W)/128 of it) and the
      per-row [C, GS] VPU blend disappears. Iterations drop from ~rows to
      ~rows/nr.
    * mp == 2 (C <= 64 maps): two adjacent window rows stack into M = 2C via a
      channel concat sharing one x-selector; the blend picks st[:C]/st[C:]
      apart. Halves matmul instructions when C half-fills the 128-row MXU.

    Loop bounds are data-adaptive over the FULL height, so (unlike the
    windowed row sweep) every |dy| samples exactly — the `radius` cap applies
    only to the `_row_kernel` path. The bounds arrive PRECOMPUTED per program
    via the SMEM side input (XLA reduces them for free while packing dym —
    the in-kernel cross-lane min/max reductions were measurable per-program
    fixed cost), and the x-hat's row-column difference base is a resident
    f32 constant (kills the per-program [W, GS] iota+convert).
    """
    rb = pl.program_id(1)
    gs = g * 9 * w

    dy = dym_ref[0, 0, 0:1]
    dx = dym_ref[0, 0, 1:2]
    m = dym_ref[0, 0, 2:3]
    row_in_blk = idx_ref[0:1, :]
    t_row = idx_ref[1:2, :]

    py = (rb * g - 1).astype(jnp.float32) + row_in_blk + t_row + dy
    # Clip so huge offsets can't overflow the f32 arithmetic; clipped values
    # land outside every row's unit hat support, i.e. contribute zero.
    pyc = jnp.clip(py, -2.0, float(h + 1))

    # x-hat in the COMPUTE dtype: only the row-column difference is formed in
    # f32 (it spans [-W-2, W+2]; bf16 ulp at 128 is 1.0) — the abs/1-/max tail
    # and the selector multiplies below then run at bf16 VPU width. Weight
    # quantization: <= 2^-9 relative inside the hat support, <= 2^-9 ABSOLUTE
    # at the support edge (|diff| near 1, bf16 ulp 2^-8) — both below bf16
    # activation noise; f32 inputs are unaffected (dlt stays f32).
    dxc = jnp.clip(dx, -float(w + 3), float(w + 3))
    dlt = (dbase_ref[...] - dxc).astype(x_ref.dtype)
    xhat_d = jnp.maximum(1.0 - jnp.abs(dlt), 0.0)              # dt [W, GS]

    # SMEM scalars, whole [1, H/G, 2] slab per batch item (Mosaic requires
    # block dims == array dims below the (8, 128) tile), indexed by rb.
    lo = bnd_ref[0, rb, 0]
    hi = bnd_ref[0, rb, 1]

    acc_dt = x_ref.dtype if x_ref.dtype == jnp.bfloat16 else jnp.float32

    if nr > 1:
        glo = lo // nr
        ghi = (hi + nr - 1) // nr
        ghi = jnp.maximum(ghi, glo)
        mf = m.astype(jnp.float32)

        def sel_dot(grp, mrow):
            # The MASK rides inside the [1, GS] y-hat factor (mrow = m, or
            # m·gate on the peeled group) — the post-loop [C, GS] multiply
            # disappears.
            base = (grp * nr).astype(jnp.float32)
            sel = jnp.concatenate(
                [
                    xhat_d
                    * (jnp.maximum(1.0 - jnp.abs(pyc - (base + r)), 0.0)
                       * mrow).astype(x_ref.dtype)
                    for r in range(nr)
                ],
                axis=0,
            )                                                  # [nr·W, GS]
            return jax.lax.dot_general(
                x_ref[0, grp], sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # First group peeled into the accumulator init; empty-range programs
        # (every sample out of image) read a clamped group index and zero
        # the contribution via the scalar gate (see the mp path below).
        g0 = jnp.minimum(glo, h // nr - 1)
        gate = (glo < ghi).astype(jnp.float32)
        acc = sel_dot(g0, mf * gate).astype(acc_dt)

        def body(grp, acc):
            return acc + sel_dot(grp, mf).astype(acc_dt)

        acc = jax.lax.fori_loop(glo + 1, ghi, body, acc)
        acc = acc.astype(w_ref.dtype)
    else:
        # Rows are PRE-STACKED in XLA ([B, H/mp, mp*C, W]); the kernel slices
        # one [mp*C, W] stack per iteration — no in-kernel concat (measured: a
        # per-iteration two-row concat costs more than the halved matmuls
        # saved). mp=2 pairs fill M=128 at C=64; mp=4 quads (M=256) halve the
        # iteration count again.
        # The MASK rides inside the [1, GS] y-hat (am = yh·m) instead of a
        # post-loop [C, GS] multiply, and the first iteration initializes the
        # accumulator directly (no zeros + add). Out-of-range programs are
        # still exact: every sample's hat support is empty there, so the
        # peeled iteration contributes am == 0.
        mf = m.astype(jnp.float32)
        plo = lo // mp
        phi = (hi + mp - 1) // mp
        phi = jnp.maximum(phi, plo)

        def stacked_dot(p):
            return jax.lax.dot_general(
                x_ref[0, p], xhat_d, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(acc_dt)                                   # [mp*C, GS]

        def am_of(p, i, gate=None):
            rf = p.astype(jnp.float32) * mp
            a = jnp.maximum(1.0 - jnp.abs(pyc - (rf + float(i))), 0.0)
            amf = a * mf if gate is None else a * (mf * gate)
            return amf.astype(acc_dt)

        # Empty-range guard: with every sample outside the image, lo == hi
        # lands plo at H/mp (an out-of-range stack) and the CLIPPED pyc can
        # still put nonzero hat weight on rows >= H — clamp the read and
        # zero the peeled contribution via the scalar gate.
        p0 = jnp.minimum(plo, h // mp - 1)
        gate = (plo < phi).astype(jnp.float32)
        st0 = stacked_dot(p0)
        acc = am_of(p0, 0, gate) * st0[:c]
        for i in range(1, mp):
            acc = acc + am_of(p0, i, gate) * st0[i * c:(i + 1) * c]

        def body(p, acc):
            st = stacked_dot(p)
            for i in range(mp):
                acc = acc + am_of(p, i) * st[i * c:(i + 1) * c]
            return acc

        acc = jax.lax.fori_loop(plo + 1, phi, body, acc)
        acc = acc.astype(w_ref.dtype)
    gw = g * w
    if gw >= 128:
        # Single stacked output conv: taps move from lanes to sublanes with
        # ONE 9-way concat ([9C, gw]) and contract against [9C, Co] in ONE
        # dot — Mosaic's per-matmul fixed cost made 9 (or 5 tap-pair) small
        # dots ~0.4 µs/program of the 128² mp-path (ablation, round 2h).
        stacked = jnp.concatenate(
            [acc[:, t * gw:(t + 1) * gw] for t in range(9)], axis=0
        )                                                    # [9C, gw]
        out = jax.lax.dot_general(
            w_ref[...], stacked, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [Co, gw]
    else:
        # gw < 128: sub-lane-width vectors make Mosaic reject the 9-way
        # concat (vpad layout mismatch — v5e sweep round 2h); keep per-tap
        # dots. Only reachable via keep-res heights whose divisors force a
        # small G; production shapes all pick gw >= 128.
        out = jnp.zeros((co, gw), jnp.float32)
        for t in range(9):
            out = out + jax.lax.dot_general(
                w_ref[t * c:(t + 1) * c], acc[:, t * gw:(t + 1) * gw],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _pack_dym(offset, mask, g: int):
    """Fold per-sample (dy, dx, mask) into tap-major lanes: one [B, H/G, 3, GS]
    tensor with lane = t·GW + row_in_block·W + w and dy/dx/mask stacked on
    sublanes (ONE block DMA per program). Shared by the forward kernels and
    the Pallas backward (ops/dcn_bwd.py)."""
    b, h, w, _ = mask.shape
    gs = g * 9 * w
    off = offset.reshape(b, h, w, 9, 2)
    v = jnp.stack([off[..., 0], off[..., 1], mask], axis=-1)  # [b,h,w,9,3]
    v = jnp.transpose(v, (0, 1, 4, 3, 2))                     # [b,h,3,9,w]
    v = v.reshape(b, h // g, g, 3, 9, w)
    return jnp.transpose(v, (0, 1, 3, 4, 2, 5)).reshape(b, h // g, 3, gs)


def _unpack_dym(packed, h: int, w: int, g: int):
    """Inverse of `_pack_dym`: [B, H/G, 3, GS] → ([B,H,W,9] dy, dx, mask)."""
    b = packed.shape[0]
    v = packed.reshape(b, h // g, 3, 9, g, w)
    v = jnp.transpose(v, (0, 1, 4, 2, 3, 5)).reshape(b, h, 3, 9, w)
    v = jnp.transpose(v, (0, 1, 4, 3, 2))                     # [b,h,w,9,3]
    return v[..., 0], v[..., 1], v[..., 2]


def _lane_idx(g: int, w: int) -> np.ndarray:
    """Constant lane-decode rows [4, GS] f32: (row_in_block, tap_row, tap_col,
    out_column) per tap-major lane (avoids div/mod by non-power-of-2
    in-kernel)."""
    gs = g * 9 * w
    lanes = np.arange(gs)
    taps = lanes // (g * w)
    return np.stack([
        (lanes % (g * w)) // w,
        taps // 3,
        taps % 3,
        lanes % w,
    ]).astype(np.float32)


# Feature-map families the Pallas kernels are VALIDATED on for this chip's
# Mosaic toolchain: the 512²-input DLA pyramid (square maps, h·c = 8192).
# Round-5 finding: the grouped kernel COMPILES but HANGS AT RUNTIME (device
# wedge, needs a claim-expiry reset) on the 256²-input family — reproduced at
# (h=w=64, c=64, nr=2) and (h=w=32, c=128, nr=4) in BOTH bf16 and f32, while
# (64, c=128) and the whole 512² family run fine; no c/w inequality separates
# the two sets, so the gate is the exact validated family. Off-family maps on
# a real TPU take the exact-gather path (correct on every shape; pure XLA).
# CPU interpret mode is unaffected (python-loop semantics can't wedge).
_TPU_VALIDATED_HC = frozenset({(128, 64), (64, 128), (32, 256), (16, 512)})


def _tpu_shape_validated(h: int, w: int, c: int) -> bool:
    return h == w and (h, c) in _TPU_VALIDATED_HC


def _dcn_onehot_fwd_impl(x, offset, mask, weight, bias, radius: int,
                         exact: bool = True, block_rows: int = 0,
                         mp_rows: int = 0):
    b, h, w, c = x.shape
    kh, kw, _, co = weight.shape
    assert (kh, kw) == (3, 3), "one-hot kernel supports 3x3 s1 p1 d1 only"
    if (jax.default_backend() != "cpu"
            and not _tpu_shape_validated(h, w, c)):
        return dcn_v2(x, offset, mask, weight, bias, stride=1, padding=1,
                      dilation=1)
    if w > 128 or 2 * h * c * w * x.dtype.itemsize > 12 * 1024 * 1024:
        # Wide/tall maps (keep-res / fix_short inputs beyond ~512) don't fit
        # the whole-map-resident selector design (K = W and the feature map
        # must sit in VMEM); take the exact gather instead of asserting.
        return dcn_v2(x, offset, mask, weight, bias, stride=1, padding=1,
                      dilation=1)
    # MXU packing for the weighted-selector path: fold rows into K on small
    # maps; pair rows into M=2C when C half-fills the MXU (see
    # `_grouped_kernel`). The row-sweep `_row_kernel` remains for exact=True
    # and shapes neither packing helps. nr must divide H: take the largest
    # divisor <= 128//W (non-power-of-two heights from keep-res still pack).
    nr = 1
    if not exact and not mp_rows:  # mp_rows override forces the M-paired path
        for d in range(min(max(1, 128 // w), h), 0, -1):
            if h % d == 0:
                nr = d
                break
    mp = 1
    if not exact and nr == 1 and (mp_rows or c <= 64):
        if mp_rows:
            mp = mp_rows
            assert h % mp == 0 and mp * c <= 256, (mp, h, c)
        elif h % 2 == 0:
            # mp=4 (M-quad, two MXU tiles) measured WORSE than pairs on v5e
            # (128² g2: 6.82 vs 6.43 ms isolated) — the M=256 lhs loses more
            # to tile pressure than the halved iterations save. Pairs stay.
            mp = 2
    grouped = nr > 1 or mp >= 2
    if not block_rows:
        # Sweep knob (perf experiments only — the auto picks are the
        # recorded optimum): CENTERPOSE_DCN_FWD_G="128:4,64:8" forces the
        # row block per map height.
        import os as _os

        ov = _os.environ.get("CENTERPOSE_DCN_FWD_G", "")
        if ov:
            for pair in ov.split(","):
                hh, _, gg = pair.partition(":")
                if hh.strip() == str(h):
                    block_rows = int(gg)
    if block_rows:
        g = block_rows
    elif grouped:
        g = _pick_grouped_block_rows(h, w, c, co, nr, mp, x.dtype.itemsize)
    else:
        g = _pick_block_rows(
            h, w, c, radius, itemsize=x.dtype.itemsize,
            mrows=(2 * c if exact else c), co=co,
        )
    assert w <= 128, f"W={w} exceeds the int8 column-selector range"
    assert h % g == 0, f"block_rows={g} must divide H={h}"
    s = 9 * w
    gs = g * s

    # Per-sample scalars folded into lanes TAP-MAJOR: lane = t·GW + g·W + w
    # (so the output conv slices one [C, G·W] block per tap — 9 matmuls per
    # program independent of G), with dy/dx/mask STACKED on sublanes into one
    # [B, H/G, 3, GS] input (one block DMA per program instead of three) via a
    # single stack + transpose chain. All reshapes happen here in XLA.
    dym = _pack_dym(offset, mask, g)
    if grouped:
        # Grouped kernels use the single stacked out conv: [9C, Co].
        wt = weight.reshape(9 * c, co).astype(x.dtype)
    else:
        # The row-sweep kernel keeps per-tap dots ([9, C, Co]).
        wt = weight.reshape(9, c, co).astype(x.dtype)

    # Constant lane-decode vectors (avoids div/mod by non-power-of-2 in-kernel).
    idx = jnp.asarray(_lane_idx(g, w))                       # [4, GS]

    if exact:
        # [x>>1 | x] channel-concat: channels [:C] of column x' hold column
        # x'-1 (zero at x'=0), channels [C:] hold column x'. Pre-TRANSPOSED to
        # [B, H, 2C, W] so the kernel matmul is the natural [M, K]x[K, N] form
        # (no per-iteration lhs transpose in Mosaic) with K exactly W.
        x_sh = jnp.pad(x, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :w, :]
        xk = jnp.transpose(
            jnp.concatenate([x_sh, x], axis=-1), (0, 1, 3, 2)
        )                                                    # [B, H, 2C, W]
        xspec = pl.BlockSpec((1, h, 2 * c, w), lambda bi, r: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    elif nr > 1:
        # Row groups pre-packed along lanes: k = r_in_group·W + w.
        xk = jnp.transpose(
            x.reshape(b, h // nr, nr, w, c), (0, 1, 4, 2, 3)
        ).reshape(b, h // nr, c, nr * w)                     # [B, H/nr, C, nrW]
        xspec = pl.BlockSpec((1, h // nr, c, nr * w),
                             lambda bi, r: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    elif mp >= 2:
        # Row STACKS pre-packed along channels: sublane i·C + c of stack p is
        # row mp·p+i (mp | H — the mp gate requires it).
        xk = jnp.transpose(
            x.reshape(b, h // mp, mp, w, c), (0, 1, 2, 4, 3)
        ).reshape(b, h // mp, mp * c, w)                     # [B, H/mp, mpC, W]
        xspec = pl.BlockSpec((1, h // mp, mp * c, w),
                             lambda bi, r: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    else:
        # Plain [C, W] per row for the un-packed row-sweep.
        xk = jnp.transpose(x, (0, 1, 3, 2))                  # [B, H, C, W]
        xspec = pl.BlockSpec((1, h, c, w), lambda bi, r: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM)

    dym_spec = pl.BlockSpec((1, 1, 3, gs), lambda bi, r: (bi, r, 0, 0),
                            memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((4, gs), lambda bi, r: (0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec(tuple(wt.shape), lambda bi, r: (0,) * wt.ndim,
                          memory_space=pltpu.VMEM)
    if grouped:
        # Per-program loop bounds as SMEM scalars: XLA reduces the clipped
        # sample y-coordinates to [lo, hi) per (batch, row block) — exactly
        # the formula the kernel used to evaluate with cross-lane min/max
        # reductions (floor/ceil commute with min/max/clip; y0 + (fy>0 ? 2:1)
        # == ceil(pyc) + 1 for every fy).
        off9 = offset.astype(jnp.float32).reshape(b, h, w, 9, 2)
        rows = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
        trow = jnp.asarray(np.repeat(np.arange(3, dtype=np.float32), 3))
        pyr = jnp.clip(rows - 1.0 + trow + off9[..., 0], -2.0, float(h + 1))
        pyg = pyr.reshape(b, h // g, g * w * 9)
        blo = jnp.clip(jnp.floor(jnp.min(pyg, axis=-1)), 0.0, float(h))
        bhi = jnp.clip(jnp.ceil(jnp.max(pyg, axis=-1)) + 1.0, 0.0, float(h))
        bnd = jnp.stack([blo, jnp.maximum(bhi, blo)], axis=-1).astype(
            jnp.int32
        )
        # Resident f32 constant: dbase[r, l] = r - (w_pos(l) - 1 + t_col(l)),
        # so the in-kernel x-hat build is one f32 subtract (dbase - dx)
        # instead of an iota+convert+subtract over [W, GS].
        lanes_np = np.arange(gs)
        pxbase = ((lanes_np % w) - 1 + (lanes_np // (g * w)) % 3)
        dbase = jnp.asarray(
            np.arange(w, dtype=np.float32)[:, None] - pxbase[None, :]
        )
        kernel = partial(_grouped_kernel, h=h, w=w, c=c, co=co, g=g, nr=nr,
                         mp=mp)
        in_specs = [
            dym_spec,
            # The grouped kernel reads only idx rows 0-1 (row_in_block,
            # tap_row) — tap_col/out_column are superseded by the resident
            # dbase constant; don't ship the dead rows.
            pl.BlockSpec((2, gs), lambda bi, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h // g, 2), lambda bi, r: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((w, gs), lambda bi, r: (0, 0),
                         memory_space=pltpu.VMEM),
            xspec, w_spec,
        ]
        operands = (dym, idx[:2], bnd, dbase, xk, wt)
    else:
        kernel = partial(_row_kernel, h=h, w=w, c=c, co=co, radius=radius, g=g,
                         exact=exact)
        in_specs = [dym_spec, idx_spec, xspec, w_spec]
        operands = (dym, idx, xk, wt)
    out_t = pl.pallas_call(
        kernel,
        grid=(b, h // g),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, co, g * w), lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // g, co, g * w), x.dtype),
        # CPU has no Mosaic: run the kernel in interpret mode so the
        # 'onehot' dcn_impl works on every backend (tests force CPU; the
        # serving CLIs expose --dcn_impl).
        interpret=(jax.default_backend() == "cpu"),
    )(*operands)
    out = jnp.transpose(
        out_t.reshape(b, h // g, co, g, w), (0, 1, 3, 4, 2)
    ).reshape(b, h, w, co)
    return out + bias.astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def dcn_v2_onehot(x, offset, mask, weight, bias, radius: int = 4,
                  exact: bool = True, block_rows: int = 0, mp_rows: int = 0):
    """One-hot MXU DCNv2 forward (see module docstring).

    Args match ops/dcn.py dcn_v2 (3x3 s1 p1 d1 implied). `exact=False` halves
    the MXU work by carrying the bilinear x-weights inside the compute-dtype
    selector (<= 2^-9 relative weight quantization in bf16) and routes to the
    MXU-packed `_grouped_kernel` where its packings apply — that path samples
    every |dy| exactly. `radius` bounds the vertical offset magnitude only on
    the `_row_kernel` path (exact=True, or shapes no packing helps): larger
    |dy| contribute 0 there. `block_rows` overrides the auto row-blocking G
    (must divide H; 0 = auto).
    """
    return _dcn_onehot_fwd_impl(x, offset, mask, weight, bias, radius, exact,
                                block_rows, mp_rows)


def _fwd(x, offset, mask, weight, bias, radius, exact, block_rows, mp_rows):
    return _dcn_onehot_fwd_impl(
        x, offset, mask, weight, bias, radius, exact, block_rows, mp_rows
    ), (x, offset, mask, weight, bias)


def _bwd(radius, exact, block_rows, mp_rows, res, g):
    # Preferred: the Pallas MXU kernel backward (ops/dcn_bwd.py) — no
    # gathers/scatters, no im2col residuals, no chunking needed.
    x, offset, mask, weight, bias = res
    from centerpose_tpu.ops.dcn_bwd import dcn_bwd_supported, dcn_v2_grads

    # Only on real TPUs: on CPU the kernels would run in Pallas interpret
    # mode (per-program python loops); the chunked autodiff below is the
    # CPU/parity path.
    if jax.default_backend() != "cpu" and dcn_bwd_supported(
            x.shape, weight.shape, itemsize=x.dtype.itemsize):
        return dcn_v2_grads(x, offset, mask, weight, bias, g)
    # Fallback: the exact-gather op's autodiff (the grouped forward is
    # numerically the same op). The vjp is built PER BATCH CHUNK (lax.map) —
    # a whole-batch tape of the gather op at 512² b16 needs ~8G of
    # [B·HW, 4C] f32 transients per layer and OOMs a single v5e; chunking
    # mirrors the reference CUDA backward's per-image loop.
    b = x.shape[0]
    chunk = DCN_GRAD_CHUNK

    def chunk_vjp(xb, ob, mb, gb):
        _, vjp = jax.vjp(
            lambda *a: dcn_v2(*a, stride=1, padding=1, dilation=1), xb, ob,
            mb, weight, bias,
        )
        return vjp(gb)

    if b > chunk and b % chunk == 0:
        n = b // chunk

        def resh(v):
            return v.reshape(n, chunk, *v.shape[1:])

        dx, doff, dm, dw, db = jax.lax.map(
            lambda t: chunk_vjp(*t), (resh(x), resh(offset), resh(mask), resh(g))
        )
        return (
            dx.reshape(b, *dx.shape[2:]),
            doff.reshape(b, *doff.shape[2:]),
            dm.reshape(b, *dm.shape[2:]),
            dw.sum(axis=0),
            db.sum(axis=0),
        )
    return chunk_vjp(x, offset, mask, g)


dcn_v2_onehot.defvjp(_fwd, _bwd)
