"""Pallas TPU kernels: the DCNv2 backward pass as MXU matmuls (3x3 s1 p1 d1).

Why: the training step was drowning in the autodiff backward of the gather
forward (ops/dcn.py). The VJP of a gather is a SCATTER-ADD, which XLA TPU
serializes row by row; the measured full-model train step spent ~40x the
forward cost in backward (NOTES_PERF round 2f/2i). Every term of the DCNv2
VJP can instead ride the MXU with the same on-the-fly one-hot selectors the
forward uses (ops/dcn_onehot.py), with NO gathers and NO scatters.

Semantics parity target: the gradient of the reference CUDA backward
(src/lib/models/networks/DCNv2/src/cuda/dcn_v2_cuda.cu — col2im for d_input,
`get_coordinate_weight` corner differences for d_offset, modulated-col dots
for d_mask/d_weight), which equals jax.vjp of the bilinear gather forward.
tests/test_dcn_bwd.py cross-checks every term against jax.vjp(dcn_v2).

Math (per program = one (batch item, block of G output rows); samples s live
tap-major on lanes, lane = t·GW + row_in_block·W + w, GS = G·9·W; x', r index
input columns/rows; hat(u) = max(0, 1-|u|)):

  forward:  samp[c, s] = Σ_r hatY(r,s) · (x[r] @ hatX)[c, s],  out = Σ_t Wtᵀ(m·samp)
  gs[c, s]  = (Wstk @ g_out) rearranged       # grad wrt samples, pre-mask
  dX[r]    += (hatY_r ∘ (m·gs)) @ hatXᵀ       # scatter-as-matmul, accumulated
                                              # into a VMEM-resident [H, C, W]
                                              # output block revisited across
                                              # the row-block grid dimension
  pg_r      = x[r] @ gs                       # [W, GS] — x[r] is the natural
                                              # NHWC row, no transpose needed
  Q         = Σ_r hatY_r · pg_r               # then, at program end:
  dF        = Σ_r dyh_r · pg_r                #   d_mask = Σ_x' hatX ∘ Q
  dyh_r     = (r == y0+1) - (r == y0)         #   d_px   = m · Σ_x' dxh ∘ Q
  dxh[x',s] = (x' == x0+1) - (x' == x0)       #   d_py   = m · Σ_x' hatX ∘ dF
  dW       += stack_t(m·samp) @ g_outᵀ        # [9C, GW] x [GW, Co], resident
                                              # accumulator over ALL programs

The corner-difference derivatives (dyh/dxh) match autodiff of the gather
forward exactly, INCLUDING integer offsets (where the hat function's
subgradient would be 0 but the one-sided corner derivative v1 - v0 is not) —
zero-initialized offset convs start training at exactly-integer positions.
Out-of-image corners contribute 0 to every term (their rows/columns fall
outside the loop/iota range), matching the zero-padded gather.

Three lean kernels instead of one (VMEM: each needs a different resident x
layout or none at all; together they exceed the 16M scoped budget at 128²):
  _dx_kernel     — no x at all; the hatXᵀ contraction is a lane-lane dot
                   against the natural [W, GS] selector (no transposed
                   operand, no sublane side inputs — see _fused_kernel).
  _dcoord_kernel — x in natural NHWC (pg_r = x[r] @ gs is already [W,C]x[C,GS]).
  _dw_kernel     — x as [H, C, W] (bx_r = x[r] @ hatX re-runs the forward row).
The production path is _fused_kernel (all three in one program); the split
kernels stay for tests/sweeps via fused=False.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from centerpose_tpu.ops.dcn import dcn_v2
from centerpose_tpu.ops.dcn_onehot import _lane_idx, _pack_dym, _unpack_dym

_VMEM_BUDGET = 14 * 1024 * 1024
# The block-G picker's VMEM models are calibrated approximations; raise the
# hard Mosaic scoped-vmem limit well above them so a model miss costs perf
# (a smaller-than-optimal G) instead of a compile failure (the default 16M
# limit rejected _dcoord at 128² bf16 G=2 by 168K).
_VMEM_LIMIT = 64 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
# The fused kernel holds both x layouts + the dX accumulator resident; its
# model budget leaves pipelining headroom under the raised hard limit.
_VMEM_BUDGET_FUSED = 44 * 1024 * 1024


def _common(dym_ref, idx_ref, rb, g: int, h: int):
    """Shared per-program sample coordinates: (py_clipped, y0, fy, m, dx)."""
    dy = dym_ref[0, 0, 0:1]
    dx = dym_ref[0, 0, 1:2]
    m = dym_ref[0, 0, 2:3]
    row_in_blk = idx_ref[0:1, :]
    t_row = idx_ref[1:2, :]
    py = (rb * g - 1).astype(jnp.float32) + row_in_blk + t_row + dy
    pyc = jnp.clip(py, -2.0, float(h + 1))
    y0 = jnp.floor(pyc)
    fy = pyc - y0
    return pyc, y0, fy, m, dx


def _xhat_lanes(idx_ref, dx, w: int, gs: int):
    """hatX [W, GS] f32 (x' on sublanes, samples on lanes) + x0 = floor(px)."""
    t_col = idx_ref[2:3, :]
    w_pos = idx_ref[3:4, :]
    px = (w_pos - 1.0) + t_col + dx
    pxc = jnp.clip(px, -2.0, float(w + 1))
    rows_f = jax.lax.broadcasted_iota(jnp.int32, (w, gs), 0).astype(jnp.float32)
    xhat = jnp.maximum(1.0 - jnp.abs(rows_f - pxc), 0.0)
    return xhat, rows_f, jnp.floor(pxc)


def _gs_lanes(w_ref, g_ref, m, c: int, co: int, g: int, w: int, dt,
              masked: bool):
    """gs [C, GS] = grad wrt (pre-mask) samples, tap-major lanes.

    One stacked matmul [9C, Co] x [Co, GW] then a 9-way lane concat of the
    sublane tap slices (C is a multiple of 8, GW of 128 — both layout-legal).
    """
    gw = g * w
    gstk = jax.lax.dot_general(
        w_ref[...], g_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [9C, GW] f32
    gs = jnp.concatenate([gstk[t * c:(t + 1) * c] for t in range(9)], axis=1)
    if masked:
        gs = gs * m
    return gs.astype(dt)


def _dx_kernel(dym_ref, idx_ref, g_ref, w_ref, out_ref, *,
               h: int, w: int, c: int, co: int, g: int):
    """dX[r] += (hatY_r ∘ m·gs) @ hatXᵀ, accumulated into the revisited
    [1, H, C, W] f32 output block (zeroed once per batch item). The hatXᵀ
    contraction is expressed as a lane-lane dot against the NATURAL [W, GS]
    selector (dot dims ((1,),(1,))) — no transposed operand, no sublane side
    input (whose 128x lane padding cost 1.12G HBM per layer)."""
    rb = pl.program_id(1)

    @pl.when(rb == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    gs = g * 9 * w
    pyc, y0, fy, m, dx = _common(dym_ref, idx_ref, rb, g, h)
    dt = g_ref.dtype
    gm = _gs_lanes(w_ref, g_ref, m, c, co, g, w, dt, masked=True)
    xhat, _, _ = _xhat_lanes(idx_ref, dx, w, gs)
    xhat_d = xhat.astype(dt)                                 # [W, GS]

    lo = jnp.clip(jnp.min(y0), 0.0, float(h)).astype(jnp.int32)
    hi = jnp.clip(
        jnp.max(y0 + jnp.where(fy > 0.0, 2.0, 1.0)), 0.0, float(h)
    ).astype(jnp.int32)
    hi = jnp.maximum(hi, lo)

    def body(r, _):
        yh = jnp.maximum(1.0 - jnp.abs(pyc - r.astype(jnp.float32)), 0.0)
        upd = jax.lax.dot_general(
            (yh.astype(dt) * gm), xhat_d, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [C, W]
        out_ref[0, r] = out_ref[0, r] + upd.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(lo, hi, body, 0)


def _dcoord_kernel(dym_ref, idx_ref, x_ref, g_ref, w_ref, out_ref, *,
                   h: int, w: int, c: int, co: int, g: int):
    """d_py / d_px / d_mask, one [1, 1, 3, GS] block per program (mirrors the
    dym input layout; the caller un-packs)."""
    rb = pl.program_id(1)
    gs = g * 9 * w
    pyc, y0, fy, m, dx = _common(dym_ref, idx_ref, rb, g, h)
    xhat, lanes, x0 = _xhat_lanes(idx_ref, dx, w, gs)
    dt = x_ref.dtype
    gsv = _gs_lanes(w_ref, g_ref, m, c, co, g, w, dt, masked=False)

    # dyh needs row y0+1 even at fy == 0 (one-sided corner derivative), so the
    # upper bound is max(y0)+2 unconditionally — unlike the forward's bound.
    lo = jnp.clip(jnp.min(y0), 0.0, float(h)).astype(jnp.int32)
    hi = jnp.clip(jnp.max(y0) + 2.0, 0.0, float(h)).astype(jnp.int32)
    hi = jnp.maximum(hi, lo)

    def body(r, carry):
        q, df = carry
        pg = jax.lax.dot_general(
            x_ref[0, r], gsv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [W, GS]
        rf = r.astype(jnp.float32)
        yh = jnp.maximum(1.0 - jnp.abs(pyc - rf), 0.0)
        dyh = (y0 == rf - 1.0).astype(jnp.float32) - (y0 == rf).astype(
            jnp.float32
        )
        return q + yh * pg, df + dyh * pg

    zero = jnp.zeros((w, gs), jnp.float32)
    q, df = jax.lax.fori_loop(lo, hi, body, (zero, zero))

    dxh = (lanes == x0 + 1.0).astype(jnp.float32) - (lanes == x0).astype(
        jnp.float32
    )
    dpx = jnp.sum(dxh * q, axis=0, keepdims=True) * m
    dpy = jnp.sum(xhat * df, axis=0, keepdims=True) * m
    dmask = jnp.sum(xhat * q, axis=0, keepdims=True)
    out_ref[0, 0] = jnp.concatenate([dpy, dpx, dmask], axis=0).astype(
        out_ref.dtype
    )


def _dw_kernel(dym_ref, idx_ref, xk_ref, gt_ref, out_ref, *,
               h: int, w: int, c: int, co: int, g: int):
    """dW += stack_t(m·samp) @ g_outᵀ into a [9C, Co] f32 block resident
    across ALL programs (samp re-runs the forward row loop)."""
    bi = pl.program_id(0)
    rb = pl.program_id(1)

    @pl.when((bi == 0) & (rb == 0))
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    gs = g * 9 * w
    gw = g * w
    pyc, y0, fy, m, dx = _common(dym_ref, idx_ref, rb, g, h)
    xhat, _, _ = _xhat_lanes(idx_ref, dx, w, gs)
    dt = xk_ref.dtype
    xhat_d = xhat.astype(dt)

    lo = jnp.clip(jnp.min(y0), 0.0, float(h)).astype(jnp.int32)
    hi = jnp.clip(
        jnp.max(y0 + jnp.where(fy > 0.0, 2.0, 1.0)), 0.0, float(h)
    ).astype(jnp.int32)
    hi = jnp.maximum(hi, lo)

    def body(r, samp):
        bx = jax.lax.dot_general(
            xk_ref[0, r], xhat_d, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [C, GS]
        yh = jnp.maximum(1.0 - jnp.abs(pyc - r.astype(jnp.float32)), 0.0)
        return samp + yh * bx

    samp = jax.lax.fori_loop(lo, hi, body, jnp.zeros((c, gs), jnp.float32))
    sampm = (samp * m).astype(dt)
    stacked = jnp.concatenate(
        [sampm[:, t * gw:(t + 1) * gw] for t in range(9)], axis=0
    )                                                        # [9C, GW]
    out_ref[...] = out_ref[...] + jax.lax.dot_general(
        stacked, gt_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _fused_kernel(dym_ref, idx_ref, x_ref, xk_ref, g_ref, gt_ref,
                  w_ref, dx_ref, dc_ref, dw_ref, *,
                  h: int, w: int, c: int, co: int, g: int, pr: int):
    """All three backward computations in ONE program: the per-program fixed
    work (gs build, selector builds, coordinate decode, the row loop's
    machinery) is shared instead of paid 3x. Needs BOTH x layouts resident
    ([H, W, C] for pg, [H, C, W] for bx) — legal under the raised 64M scoped
    vmem. The shared row loop uses the dcoord bound (max(y0)+2, one-sided
    corner derivative); the extra row at fy == 0 contributes yh == 0 to the
    dX/dW terms, matching the split kernels exactly.

    The dX scatter-as-matmul contracts the LANES of both operands
    (dot_general dims ((1,),(1,))): sel [C, GS] x hatX_m [W, GS] -> [C, W].
    Mosaic lowers this natively (measured vs the sublane-contraction form on
    v5e), which removes the transposed [GS, W] selector — and with it the
    [B, H/G, GS, k] sublane side inputs whose 128x lane padding cost 1.12G
    HBM per DCN layer (the round-3 OOM; NOTES_PERF round 3d).

    Per-row hat applications ride the SMALLER matmul operand (shape-gated,
    exact algebra — the kernel is VPU-bound, NOTES_PERF round 2j):
      c <= w (the 128² C64 layers): yh/dyh fold into the [C, GS] gs-selector,
              so the q/df updates are pure matmul+add and the dX update reuses
              the yh-folded selector — no per-row [W, GS] multiplies remain.
      w < c  (64²+ C128+): yh folds into the [W, GS] hatX for both the samp
              accumulation and the dX dot — no per-row [C, GS] multiplies
              remain (yh is lane-major and broadcasts over sublanes for free).
    The MASK rides the [W, GS] hat factor (one multiply per program) instead
    of a per-program [C, GS] gm copy. The first loop row is peeled into the
    carry init; empty ranges (every sample off-image) read a clamped row and
    are zeroed by a scalar gate on the hat factors.

    pr > 1 groups input rows per loop iteration (pr | H; rows riding along
    at the [lo, hi) edges contribute exactly zero — their hat/corner
    supports are empty, same argument as the fy == 0 extra row — so
    grouping is exact):
      c <= w (128² C64, pr=2): both rows' selectors stack, filling the MXU
        dims C=64 half-fills — pq/pd contract K = 2C = 128 against the
        paired x layout [H/2, W, 2C]; bxs contracts K = 2W against
        [H/2, C, 2W]; the dX dot runs M = 2C = 128 and writes one [2C, W]
        block into the paired [H/2, 2C, W] accumulator.
      w < c (64²+ C128+, pr = 128/W): pg runs ONE dot per group with
        M = pr·W = 128 against [H/pr, pr·W, C] (a free NHWC reshape); bxs
        contracts K = pr·W = 128 against [H/pr, C, pr·W]; the dX dot stays
        per-row (M = C >= 128 already full), writing pr rows per group."""
    bi = pl.program_id(0)
    rb = pl.program_id(1)

    @pl.when(rb == 0)
    def _():
        dx_ref[...] = jnp.zeros(dx_ref.shape, dx_ref.dtype)

    @pl.when((bi == 0) & (rb == 0))
    def _():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    assert pr == 1 or h % pr == 0, (pr, h)
    assert pr == 1 or not (c <= w) or pr == 2, (pr, c, w)
    gs = g * 9 * w
    gw = g * w
    pyc, y0, fy, m, dxo = _common(dym_ref, idx_ref, rb, g, h)
    xhat, lanes, x0 = _xhat_lanes(idx_ref, dxo, w, gs)
    dt = x_ref.dtype
    xhat_d = xhat.astype(dt)
    gsv = _gs_lanes(w_ref, g_ref, m, c, co, g, w, dt, masked=False)
    xhat_m = (xhat * m).astype(dt)                           # [W, GS]
    fold_q = c <= w

    lo = jnp.clip(jnp.min(y0), 0.0, float(h)).astype(jnp.int32)
    hi = jnp.clip(jnp.max(y0) + 2.0, 0.0, float(h)).astype(jnp.int32)
    hi = jnp.maximum(hi, lo)

    def row_terms(r, gate):
        """(q, df, samp) contributions + the dX row update for row r.

        `gate` (peeled first row only) zeroes every term on empty-range
        programs — it rides the hat factors, so all four outputs vanish.
        """
        rf = r.astype(jnp.float32)
        yh = jnp.maximum(1.0 - jnp.abs(pyc - rf), 0.0)
        dyh = (y0 == rf - 1.0).astype(jnp.float32) - (y0 == rf).astype(
            jnp.float32
        )
        if gate is not None:
            yh = yh * gate
            dyh = dyh * gate
        if fold_q:
            qsel = yh.astype(dt) * gsv                       # [C, GS]
            dsel = dyh.astype(dt) * gsv
            pq = jax.lax.dot_general(
                x_ref[0, r], qsel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                # [W, GS] = yh·pg
            pd = jax.lax.dot_general(
                x_ref[0, r], dsel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                # [W, GS] = dyh·pg
            bxs = yh * jax.lax.dot_general(
                xk_ref[0, r], xhat_d, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                # [C, GS] = yh·bx
            upd = jax.lax.dot_general(
                qsel, xhat_m, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                # [C, W]
        else:
            pg = jax.lax.dot_general(
                x_ref[0, r], gsv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                # [W, GS]
            pq = yh * pg
            pd = dyh * pg
            yhd = yh.astype(dt)
            bxs = jax.lax.dot_general(
                xk_ref[0, r], yhd * xhat_d, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                # [C, GS] = yh·bx
            upd = jax.lax.dot_general(
                gsv, yhd * xhat_m, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                # [C, W]
        return pq, pd, bxs, upd

    def pair_terms(p, gate):
        """Two-row variant: rows (2p, 2p+1) share one iteration. Selector
        stacks fill MXU K (pq/pd: 2C, bxs: 2W) and M (dX: 2C); the q/df/samp
        contributions of both rows arrive pre-summed by the contraction."""
        r0f = (2 * p).astype(jnp.float32)
        yh0 = jnp.maximum(1.0 - jnp.abs(pyc - r0f), 0.0)
        yh1 = jnp.maximum(1.0 - jnp.abs(pyc - (r0f + 1.0)), 0.0)
        dyh0 = (y0 == r0f - 1.0).astype(jnp.float32) - (y0 == r0f).astype(
            jnp.float32
        )
        dyh1 = (y0 == r0f).astype(jnp.float32) - (y0 == r0f + 1.0).astype(
            jnp.float32
        )
        if gate is not None:
            yh0 = yh0 * gate
            yh1 = yh1 * gate
            dyh0 = dyh0 * gate
            dyh1 = dyh1 * gate
        qsel2 = jnp.concatenate(
            [yh0.astype(dt) * gsv, yh1.astype(dt) * gsv], axis=0
        )                                                    # [2C, GS]
        dsel2 = jnp.concatenate(
            [dyh0.astype(dt) * gsv, dyh1.astype(dt) * gsv], axis=0
        )
        pq = jax.lax.dot_general(
            x_ref[0, p], qsel2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [W, GS]
        pd = jax.lax.dot_general(
            x_ref[0, p], dsel2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sel2x = jnp.concatenate(
            [yh0.astype(dt) * xhat_d, yh1.astype(dt) * xhat_d], axis=0
        )                                                    # [2W, GS]
        bxs = jax.lax.dot_general(
            xk_ref[0, p], sel2x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [C, GS]
        upd = jax.lax.dot_general(
            qsel2, xhat_m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [2C, W]
        return pq, pd, bxs, upd

    def group_terms(p, gate):
        """w < c group variant: pr rows share one pg dot (M = pr·W) and one
        bxs dot (K = pr·W); the dX updates stay per-row (M = C full)."""
        base = (pr * p).astype(jnp.float32)
        pg2 = jax.lax.dot_general(
            x_ref[0, p], gsv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [pr·W, GS]
        yhs, dyhs = [], []
        for i in range(pr):
            rf = base + float(i)
            yh = jnp.maximum(1.0 - jnp.abs(pyc - rf), 0.0)
            dyh = (y0 == rf - 1.0).astype(jnp.float32) - (y0 == rf).astype(
                jnp.float32
            )
            if gate is not None:
                yh = yh * gate
                dyh = dyh * gate
            yhs.append(yh)
            dyhs.append(dyh)
        pq = sum(yhs[i] * pg2[i * w:(i + 1) * w] for i in range(pr))
        pd = sum(dyhs[i] * pg2[i * w:(i + 1) * w] for i in range(pr))
        sel = jnp.concatenate(
            [yhs[i].astype(dt) * xhat_d for i in range(pr)], axis=0
        )                                                    # [pr·W, GS]
        bxs = jax.lax.dot_general(
            xk_ref[0, p], sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [C, GS]
        msel = m.astype(dt) * sel
        upds = [
            jax.lax.dot_general(
                gsv, msel[i * w:(i + 1) * w], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                # [C, W]
            for i in range(pr)
        ]
        return pq, pd, bxs, upds

    if pr > 1 and fold_q:
        def body(p, carry):
            q, df, samp = carry
            pq, pd, bxs, upd = pair_terms(p, None)
            dx_ref[0, p] = dx_ref[0, p] + upd.astype(dx_ref.dtype)
            return q + pq, df + pd, samp + bxs

        plo = lo // 2
        phi = (hi + 1) // 2
        phi = jnp.maximum(phi, plo)
        p0 = jnp.minimum(plo, h // 2 - 1)
        gate = (plo < phi).astype(jnp.float32)
        q, df, samp, upd0 = pair_terms(p0, gate)
        dx_ref[0, p0] = dx_ref[0, p0] + upd0.astype(dx_ref.dtype)
        q, df, samp = jax.lax.fori_loop(plo + 1, phi, body, (q, df, samp))
    elif pr > 1:
        def body(p, carry):
            q, df, samp = carry
            pq, pd, bxs, upds = group_terms(p, None)
            for i in range(pr):
                dx_ref[0, pr * p + i] = (
                    dx_ref[0, pr * p + i] + upds[i].astype(dx_ref.dtype)
                )
            return q + pq, df + pd, samp + bxs

        plo = lo // pr
        phi = (hi + pr - 1) // pr
        phi = jnp.maximum(phi, plo)
        p0 = jnp.minimum(plo, h // pr - 1)
        gate = (plo < phi).astype(jnp.float32)
        q, df, samp, upds0 = group_terms(p0, gate)
        for i in range(pr):
            dx_ref[0, pr * p0 + i] = (
                dx_ref[0, pr * p0 + i] + upds0[i].astype(dx_ref.dtype)
            )
        q, df, samp = jax.lax.fori_loop(plo + 1, phi, body, (q, df, samp))
    else:
        def body(r, carry):
            q, df, samp = carry
            pq, pd, bxs, upd = row_terms(r, None)
            dx_ref[0, r] = dx_ref[0, r] + upd.astype(dx_ref.dtype)
            return q + pq, df + pd, samp + bxs

        r0 = jnp.minimum(lo, h - 1)
        gate = (lo < hi).astype(jnp.float32)
        q, df, samp, upd0 = row_terms(r0, gate)
        dx_ref[0, r0] = dx_ref[0, r0] + upd0.astype(dx_ref.dtype)
        q, df, samp = jax.lax.fori_loop(lo + 1, hi, body, (q, df, samp))

    dxh = (lanes == x0 + 1.0).astype(jnp.float32) - (lanes == x0).astype(
        jnp.float32
    )
    dpx = jnp.sum(dxh * q, axis=0, keepdims=True) * m
    dpy = jnp.sum(xhat * df, axis=0, keepdims=True) * m
    dmask = jnp.sum(xhat * q, axis=0, keepdims=True)
    dc_ref[0, 0] = jnp.concatenate([dpy, dpx, dmask], axis=0).astype(
        dc_ref.dtype
    )

    sampm = (samp * m).astype(dt)
    stacked = jnp.concatenate(
        [sampm[:, t * gw:(t + 1) * gw] for t in range(9)], axis=0
    )                                                        # [9C, GW]
    dw_ref[...] = dw_ref[...] + jax.lax.dot_general(
        stacked, gt_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dw_ref.dtype)


def _pick_bwd_block_rows(h: int, w: int, c: int, co: int, itemsize: int,
                         kernel: str) -> int:
    """Largest row block G with G | H, G·W a lane multiple (the 9-way
    concats require >= 128), and the kernel's live VMEM within budget.
    Returns 0 when no legal G exists (caller falls back to autodiff).

    The models are calibrated against Mosaic's scoped-vmem report on v5e:
    _dcoord at 128² C64 f32 measured 16.07M (G=1) / 16.20M (G=2) — the
    resident x block is effectively ~3x-buffered, and the [W, GS] f32 loop
    buffers share stack slots across live ranges (~3.2 live at the peak).
    """
    kmin = max(1, (128 + w - 1) // w)
    # Measured on v5e (b16 bf16-operand sweep, NOTES_PERF round 2j): the
    # SMALLEST lane-legal block wins except at w=128 where G=2 edges G=1 —
    # larger blocks pay more in vreg pressure than they save in programs
    # (64²: G=2 11.63 ms vs the old max-G pick 13.20; 32²: G=4 6.79 vs 7.33).
    prefs = (2, 1, 4) if kmin == 1 else (1, 2, 4)
    for mult in prefs:
        g = kmin * mult
        if g > h or h % g or (g * w) % 128:
            continue
        gs = g * 9 * w
        gw = g * w
        if kernel == "fused":
            live = (
                3 * h * w * c * itemsize          # resident x NHWC
                + 3 * h * c * w * itemsize        # resident x [H, C, W]
                + 2 * h * c * w * 4               # dX accumulator + writeback
                + 16 * w * gs                     # q/df/pg f32 at peak
                + 4 * c * gs * 4                  # samp/bx f32
                + 3 * c * gs * itemsize           # gsv/sampm + fold temps
                # qsel2/dsel2 [2C, GS] + sel2x [2W, GS] (pair) / yh-folded
                # hats (w < c)
                + (2 * max(c, w) + 2 * c) * gs * itemsize
                + 2 * gs * w * itemsize           # xhat_d + xhat_m
                + 9 * c * gw * 4
                + 2 * 9 * c * co * 4
                + 2 * co * gw * 4
            )
        elif kernel == "coord":
            live = (
                3 * h * w * c * itemsize          # resident x, ~3x-buffered
                + 13 * w * gs                     # ~3.2 [W, GS] f32 at peak
                + c * gs * itemsize
                + 9 * c * gw * 4
                + 2 * co * gw * 4
            )
        elif kernel == "dx":
            live = (
                2 * h * c * w * 4                 # dX accumulator + writeback
                + gs * w * itemsize               # hatX [W, GS]
                + 3 * c * gs * 4                  # gm + loop temps
                + 9 * c * gw * 4
                + 9 * c * co * 4
            )
        else:                                     # 'dw'
            live = (
                3 * h * c * w * itemsize          # resident x, ~3x-buffered
                + gs * w * (itemsize + 4)
                + 2 * c * gs * 4                  # samp f32 + carry copy
                + c * gs * itemsize
                + 9 * c * gw * itemsize
                + 2 * gw * co * 4
                + 2 * 9 * c * co * 4
            )
        budget = _VMEM_BUDGET_FUSED if kernel == "fused" else _VMEM_BUDGET
        if live <= budget:
            return g
    return 0


def _pick_all(h, w, c, co, itemsize, block_rows=0):
    if block_rows:
        if h % block_rows or (block_rows * w) % 128:
            return 0, 0, 0
        return block_rows, block_rows, block_rows
    return (
        _pick_bwd_block_rows(h, w, c, co, itemsize, "dx"),
        _pick_bwd_block_rows(h, w, c, co, itemsize, "coord"),
        _pick_bwd_block_rows(h, w, c, co, itemsize, "dw"),
    )


def dcn_bwd_supported(x_shape, w_shape, block_rows: int = 0,
                      itemsize: int = 4) -> int:
    """Returns a representative row block G (>0 iff every kernel has a legal
    block), or 0 if the shapes are unsupported. Mirrors `dcn_v2_grads`'s
    operand-dtype resolution: f32 primals compute with bf16 operands on TPU
    (see there), so the gate sizes VMEM with the effective itemsize."""
    b, h, w, c = x_shape
    kh, kw, _, co = w_shape
    if (kh, kw) != (3, 3) or w > 128 or c % 8 or co % 8:
        return 0
    if jax.default_backend() != "cpu":
        # Same hardware-validated-family gate as the forward kernels
        # (ops/dcn_onehot.py _tpu_shape_validated): off-family maps hit
        # Mosaic runtime hangs on this toolchain (round-5 reproducer); the
        # remat+chunked autodiff fallback is correct on every shape.
        from centerpose_tpu.ops.dcn_onehot import _tpu_shape_validated

        if not _tpu_shape_validated(h, w, c):
            return 0
    if itemsize == 4 and jax.default_backend() != "cpu":
        itemsize = 2
    gs = _pick_all(h, w, c, co, itemsize, block_rows)
    return min(gs) if all(gs) else 0


def dcn_v2_grads(x, offset, mask, weight, bias, dout, *, block_rows: int = 0,
                 compute_dtype=None, fused=None):
    """All five DCNv2 cotangents via the Pallas kernels (no gather/scatter).

    Args mirror ops/dcn.py dcn_v2 (3x3 s1 p1 d1 implied); `dout` is the
    cotangent of the output [B, H, W, Co]. `compute_dtype` optionally casts
    the matmul operands (e.g. bf16 for f32 training inputs — the f32
    accumulators keep the reductions exact). Returns (dx, doffset, dmask,
    dweight, dbias) in the primal dtypes.
    """
    b, h, w, c = x.shape
    co = weight.shape[3]
    interp = jax.default_backend() == "cpu"
    if compute_dtype is not None:
        dt = jnp.dtype(compute_dtype)
    elif interp or x.dtype != jnp.float32:
        dt = x.dtype
    else:
        # On TPU, f32 MXU operands are bf16-quantized by default precision
        # anyway (measured: kernel-vs-autodiff rel err 2.6e-3 either way), and
        # f32 residents push the 128² kernels past the 16M scoped-vmem limit
        # (measured 16.07M at G=1) — so f32 primals compute with bf16 operands
        # + f32 accumulators. CPU (interpret) keeps f32: the parity tests
        # assert tight agreement there.
        dt = jnp.dtype(jnp.bfloat16)
    g_dx, g_co, g_dw = _pick_all(h, w, c, co, dt.itemsize, block_rows)
    assert g_dx and g_co and g_dw, (x.shape, weight.shape, block_rows, dt)
    offf = offset.astype(jnp.float32)
    maskf = mask.astype(jnp.float32)
    wstk = weight.reshape(9 * c, co).astype(dt)
    xd = x.astype(dt)
    w_spec = pl.BlockSpec((9 * c, co), lambda bi, r: (0, 0),
                          memory_space=pltpu.VMEM)

    def prep(g):
        """Per-row-block-G packs: (dym, idx, g_blk) + the block specs."""
        gw, gs = g * w, g * 9 * w
        dym = _pack_dym(offf, maskf, g)
        idx = jnp.asarray(_lane_idx(g, w))
        gnc = jnp.transpose(dout, (0, 1, 3, 2)).astype(dt)   # [B, H, Co, W]
        g_blk = jnp.transpose(
            gnc.reshape(b, h // g, g, co, w), (0, 1, 3, 2, 4)
        ).reshape(b, h // g, co, gw)                         # [B,H/G,Co,GW]
        dym_spec = pl.BlockSpec((1, 1, 3, gs), lambda bi, r: (bi, r, 0, 0),
                                memory_space=pltpu.VMEM)
        idx_spec = pl.BlockSpec((4, gs), lambda bi, r: (0, 0),
                                memory_space=pltpu.VMEM)
        g_spec = pl.BlockSpec((1, 1, co, gw), lambda bi, r: (bi, r, 0, 0),
                              memory_space=pltpu.VMEM)
        return dym, idx, g_blk, dym_spec, idx_spec, g_spec

    if fused is False:
        g_f = 0                     # force the split kernels (tests/sweeps)
    elif block_rows:
        # Forced block: use it for the fused kernel too (sweep escape hatch;
        # the 64M hard limit still rejects truly infeasible blocks).
        g_f = block_rows
    else:
        g_f = _pick_bwd_block_rows(h, w, c, co, dt.itemsize, "fused")
    if g_f:
        # --- fused: one program computes dX, d_offset/d_mask and dW ---
        g = g_f
        gw, gs = g * w, g * 9 * w
        dym, idx, g_blk, dym_spec, idx_spec, g_spec = prep(g)
        gt_blk = dout.astype(dt).reshape(b, h // g, gw, co)  # [B,H/G,GW,Co]
        if c <= w:
            pr = 2 if h % 2 == 0 else 1
        else:
            # w < c: largest divisor of H with pr·W <= 128 (mirrors the
            # forward's K-fold nr pick).
            pr = 1
            for d in range(min(max(1, 128 // w), h), 0, -1):
                if h % d == 0:
                    pr = d
                    break
        if pr > 1 and c <= w:
            # Paired input-row layouts (see _fused_kernel): both built from
            # one [B, H/2, 2, W, C] view of the NHWC input in XLA.
            xp = xd.reshape(b, h // 2, 2, w, c)
            x_in = jnp.transpose(xp, (0, 1, 3, 2, 4)).reshape(
                b, h // 2, w, 2 * c
            )                                                # [B,H/2,W,2C]
            xk_in = jnp.transpose(xp, (0, 1, 4, 2, 3)).reshape(
                b, h // 2, c, 2 * w
            )                                                # [B,H/2,C,2W]
            x_spec = pl.BlockSpec((1, h // 2, w, 2 * c),
                                  lambda bi, r: (bi, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
            xk_spec = pl.BlockSpec((1, h // 2, c, 2 * w),
                                   lambda bi, r: (bi, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
            dx_shape = (b, h // 2, 2 * c, w)
        elif pr > 1:
            # w < c: row groups stacked on SUBLANES — a free NHWC reshape.
            x_in = xd.reshape(b, h // pr, pr * w, c)         # [B,H/pr,prW,C]
            xk_in = jnp.transpose(x_in, (0, 1, 3, 2))        # [B,H/pr,C,prW]
            x_spec = pl.BlockSpec((1, h // pr, pr * w, c),
                                  lambda bi, r: (bi, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
            xk_spec = pl.BlockSpec((1, h // pr, c, pr * w),
                                   lambda bi, r: (bi, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
            dx_shape = (b, h, c, w)
        else:
            x_in = xd
            xk_in = jnp.transpose(xd, (0, 1, 3, 2))          # [B, H, C, W]
            x_spec = pl.BlockSpec((1, h, w, c), lambda bi, r: (bi, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
            xk_spec = pl.BlockSpec((1, h, c, w), lambda bi, r: (bi, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
            dx_shape = (b, h, c, w)
        dx_t, dcoord, dw = pl.pallas_call(
            partial(_fused_kernel, h=h, w=w, c=c, co=co, g=g, pr=pr),
            grid=(b, h // g),
            in_specs=[
                dym_spec, idx_spec, x_spec, xk_spec, g_spec,
                pl.BlockSpec((1, 1, gw, co), lambda bi, r: (bi, r, 0, 0),
                             memory_space=pltpu.VMEM),
                w_spec,
            ],
            out_specs=[
                pl.BlockSpec(
                    (1,) + dx_shape[1:], lambda bi, r: (bi, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, 1, 3, gs), lambda bi, r: (bi, r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9 * c, co), lambda bi, r: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(dx_shape, jnp.float32),
                jax.ShapeDtypeStruct((b, h // g, 3, gs), jnp.float32),
                jax.ShapeDtypeStruct((9 * c, co), jnp.float32),
            ],
            interpret=interp,
            compiler_params=_COMPILER_PARAMS,
        )(dym, idx, x_in, xk_in, g_blk, gt_blk, wstk)
        if pr > 1 and c <= w:
            dx_t = dx_t.reshape(b, h // 2, 2, c, w).reshape(b, h, c, w)
        dx = jnp.transpose(dx_t, (0, 1, 3, 2)).astype(x.dtype)
        dpy, dpx, dmask = _unpack_dym(dcoord, h, w, g)
        doffset = jnp.stack([dpy, dpx], axis=-1).reshape(b, h, w, 18).astype(
            offset.dtype
        )
        dweight = dw.reshape(3, 3, c, co).astype(weight.dtype)
        dbias = jnp.sum(dout, axis=(0, 1, 2)).astype(bias.dtype)
        return dx, doffset, dmask.astype(mask.dtype), dweight, dbias

    # --- dX ---
    g = g_dx
    gw, gs = g * w, g * 9 * w
    dym, idx, g_blk, dym_spec, idx_spec, g_spec = prep(g)
    dx_t = pl.pallas_call(
        partial(_dx_kernel, h=h, w=w, c=c, co=co, g=g),
        grid=(b, h // g),
        in_specs=[dym_spec, idx_spec, g_spec, w_spec],
        out_specs=pl.BlockSpec((1, h, c, w), lambda bi, r: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, c, w), jnp.float32),
        interpret=interp,
        compiler_params=_COMPILER_PARAMS,
    )(dym, idx, g_blk, wstk)
    dx = jnp.transpose(dx_t, (0, 1, 3, 2)).astype(x.dtype)

    # --- d_offset / d_mask ---
    g = g_co
    gw, gs = g * w, g * 9 * w
    dym, idx, g_blk, dym_spec, idx_spec, g_spec = prep(g)
    dcoord = pl.pallas_call(
        partial(_dcoord_kernel, h=h, w=w, c=c, co=co, g=g),
        grid=(b, h // g),
        in_specs=[
            dym_spec, idx_spec,
            pl.BlockSpec((1, h, w, c), lambda bi, r: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            g_spec, w_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, 3, gs), lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h // g, 3, gs), jnp.float32),
        interpret=interp,
        compiler_params=_COMPILER_PARAMS,
    )(dym, idx, xd, g_blk, wstk)
    dpy, dpx, dmask = _unpack_dym(dcoord, h, w, g)           # [B,H,W,9] each
    doffset = jnp.stack([dpy, dpx], axis=-1).reshape(b, h, w, 18).astype(
        offset.dtype
    )

    # --- dW ---
    g = g_dw
    gw, gs = g * w, g * 9 * w
    dym, idx, _, dym_spec, idx_spec, _ = prep(g)
    gt_blk = dout.astype(dt).reshape(b, h // g, gw, co)      # [B,H/G,GW,Co]
    xk = jnp.transpose(xd, (0, 1, 3, 2))                     # [B, H, C, W]
    dw = pl.pallas_call(
        partial(_dw_kernel, h=h, w=w, c=c, co=co, g=g),
        grid=(b, h // g),
        in_specs=[dym_spec, idx_spec,
                  pl.BlockSpec((1, h, c, w), lambda bi, r: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, gw, co), lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((9 * c, co), lambda bi, r: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * c, co), jnp.float32),
        interpret=interp,
        compiler_params=_COMPILER_PARAMS,
    )(dym, idx, xk, gt_blk)
    dweight = dw.reshape(3, 3, c, co).astype(weight.dtype)

    dbias = jnp.sum(dout, axis=(0, 1, 2)).astype(bias.dtype)
    return dx, doffset, dmask.astype(mask.dtype), dweight, dbias


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def dcn_v2_kgrad(x, offset, mask, weight, bias, compute_dtype=None):
    """Exact-gather DCNv2 forward with the Pallas kernel backward.

    Numerically the same function as ops/dcn.py dcn_v2; only the VJP differs
    (MXU kernels instead of autodiff's scatter-adds). Training path for
    supported shapes — callers gate on `dcn_bwd_supported`.
    """
    return dcn_v2(x, offset, mask, weight, bias, stride=1, padding=1,
                  dilation=1)


def _kgrad_fwd(x, offset, mask, weight, bias, compute_dtype):
    out = dcn_v2(x, offset, mask, weight, bias, stride=1, padding=1,
                 dilation=1)
    return out, (x, offset, mask, weight, bias)


def _kgrad_bwd(compute_dtype, res, dout):
    return dcn_v2_grads(*res, dout, compute_dtype=compute_dtype)


dcn_v2_kgrad.defvjp(_kgrad_fwd, _kgrad_bwd)
