"""Deformable PSROI pooling vs an independent numpy mirror.

The mirror below re-implements the reference semantics
(/root/reference/src/lib/models/networks/DCNv2/src/cpu/
dcn_v2_psroi_pooling_cpu.cpp:58-146) with plain python loops, written from the
documented per-element contract — NOT from centerpose_tpu/ops/psroi.py — so a
shared bug can't hide.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from centerpose_tpu.ops.psroi import dcn_v2_psroi_pooling


def numpy_psroi(x, rois, trans, spatial_scale, pooled_size, output_dim,
                group_size, part_size, sample_per_part, trans_std):
    """Loop mirror. x: [B, H, W, C] (NHWC); rois: [N, 5]; trans:
    [N, 2*num_classes, ps, ps] or None."""
    B, H, W, C = x.shape
    P, S, ps = pooled_size, sample_per_part, part_size
    n_rois = rois.shape[0]
    num_classes = 1 if trans is None else trans.shape[1] // 2
    ch_each = output_dim // num_classes
    out = np.zeros((n_rois, P, P, output_dim), np.float64)
    def c_round(v):
        # C round(): half away from zero (python round is half-to-even).
        return np.sign(v) * np.floor(np.abs(v) + 0.5)

    for n in range(n_rois):
        b = int(round(rois[n, 0]))
        sw = c_round(rois[n, 1]) * spatial_scale - 0.5
        sh = c_round(rois[n, 2]) * spatial_scale - 0.5
        ew = (c_round(rois[n, 3]) + 1.0) * spatial_scale - 0.5
        eh = (c_round(rois[n, 4]) + 1.0) * spatial_scale - 0.5
        roi_w = max(ew - sw, 0.1)
        roi_h = max(eh - sh, 0.1)
        bw, bh = roi_w / P, roi_h / P
        subw, subh = bw / S, bh / S
        for ctop in range(output_dim):
            cls = ctop // ch_each
            for ph in range(P):
                for pw in range(P):
                    part_h = min(max(int(np.floor(ph / P * ps)), 0), ps - 1)
                    part_w = min(max(int(np.floor(pw / P * ps)), 0), ps - 1)
                    if trans is None:
                        tx = ty = 0.0
                    else:
                        tx = trans[n, cls * 2, part_h, part_w] * trans_std
                        ty = trans[n, cls * 2 + 1, part_h, part_w] * trans_std
                    wstart = pw * bw + sw + tx * roi_w
                    hstart = ph * bh + sh + ty * roi_h
                    gh = min(max(int(np.floor(ph * group_size / P)), 0),
                             group_size - 1)
                    gw = min(max(int(np.floor(pw * group_size / P)), 0),
                             group_size - 1)
                    c = (ctop * group_size + gh) * group_size + gw
                    total, cnt = 0.0, 0
                    for iy in range(S):
                        for ix in range(S):
                            w = wstart + ix * subw
                            h = hstart + iy * subh
                            if w < -0.5 or w > W - 0.5 or h < -0.5 or h > H - 0.5:
                                continue
                            w = min(max(w, 0.0), W - 1.0)
                            h = min(max(h, 0.0), H - 1.0)
                            x0, y0 = int(np.floor(w)), int(np.floor(h))
                            x1, y1 = min(x0 + 1, W - 1), min(y0 + 1, H - 1)
                            dx, dy = w - x0, h - y0
                            v = ((1 - dx) * (1 - dy) * x[b, y0, x0, c]
                                 + (1 - dx) * dy * x[b, y1, x0, c]
                                 + dx * (1 - dy) * x[b, y0, x1, c]
                                 + dx * dy * x[b, y1, x1, c])
                            total += v
                            cnt += 1
                    out[n, ph, pw, ctop] = total / cnt if cnt else 0.0
    return out


@pytest.mark.parametrize("group_size,output_dim,trans_std",
                         [(1, 8, 0.0), (2, 4, 0.1), (3, 2, 0.2)])
def test_matches_numpy_mirror(group_size, output_dim, trans_std):
    rng = np.random.RandomState(0)
    H, W = 12, 16
    C = output_dim * group_size * group_size
    P, ps, S = 3, 3, 4
    x = rng.randn(2, H, W, C).astype(np.float32)
    # ROIs in image coords (spatial_scale maps them onto the feature map),
    # including one partially outside the image.
    rois = np.array([
        [0, 2.0, 3.0, 30.0, 28.0],
        [1, 0.0, 0.0, 60.0, 44.0],
        [0, -8.0, -6.0, 10.0, 12.0],
    ], np.float32)
    trans = (0.5 * rng.randn(3, 2, ps, ps)).astype(np.float32)
    got = dcn_v2_psroi_pooling(
        jnp.asarray(x), jnp.asarray(rois), jnp.asarray(trans),
        spatial_scale=0.25, pooled_size=P, output_dim=output_dim,
        group_size=group_size, part_size=ps, sample_per_part=S,
        trans_std=trans_std)
    ref = numpy_psroi(x, rois, trans, 0.25, P, output_dim, group_size, ps, S,
                      trans_std)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)


def test_half_coordinate_rounding():
    """ROI corners on exact .5 (incl. negative): C round() is half away from
    zero — 2.5 -> 3, -2.5 -> -3 — where numpy/python round half-to-even would
    give 2 / -2 (ADVICE r2)."""
    rng = np.random.RandomState(2)
    x = rng.randn(1, 12, 16, 8).astype(np.float32)
    rois = np.array([
        [0, 2.5, 3.5, 30.5, 27.5],
        [0, -2.5, -0.5, 10.5, 12.5],
        [0, 1.5, 2.5, 29.5, 28.5],
    ], np.float32)
    kw = dict(spatial_scale=0.25, pooled_size=3, output_dim=8, group_size=1,
              part_size=3, sample_per_part=4, trans_std=0.0)
    got = dcn_v2_psroi_pooling(jnp.asarray(x), jnp.asarray(rois), None, **kw)
    ref = numpy_psroi(x, rois, None, 0.25, 3, 8, 1, 3, 4, 0.0)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)
    # The half-away rounding must actually change the result vs half-to-even:
    # ROI x1=2.5 -> 3 (C) vs 2 (banker's) shifts the ROI start by a full cell.
    rois_shift = rois.copy()
    rois_shift[0, 1] = 2.0  # what half-to-even would have produced
    ref_shift = numpy_psroi(x, rois_shift, None, 0.25, 3, 8, 1, 3, 4, 0.0)
    assert not np.allclose(ref[0], ref_shift[0])


def test_multiclass_trans_selection():
    """num_classes=2: class_id = ctop // channels_each_class selects the
    class's (x, y) offset channels (dcn_v2_psroi_pooling_cpu.cpp:100-105) —
    distinct per-class offsets must produce distinct outputs (ADVICE r2)."""
    rng = np.random.RandomState(3)
    P, ps, S = 3, 3, 2
    group_size, output_dim = 2, 4  # 2 classes x 2 channels each
    C = output_dim * group_size * group_size
    x = rng.randn(1, 12, 16, C).astype(np.float32)
    rois = np.array([[0, 2.0, 3.0, 40.0, 36.0]], np.float32)
    trans = (0.8 * rng.randn(1, 4, ps, ps)).astype(np.float32)  # 2 classes
    kw = dict(spatial_scale=0.25, pooled_size=P, output_dim=output_dim,
              group_size=group_size, part_size=ps, sample_per_part=S,
              trans_std=0.2)
    got = dcn_v2_psroi_pooling(jnp.asarray(x), jnp.asarray(rois),
                               jnp.asarray(trans), **kw)
    ref = numpy_psroi(x, rois, trans, 0.25, P, output_dim, group_size, ps, S,
                      0.2)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)
    # Guard that the two classes' offsets genuinely differ in this fixture
    # (otherwise the class-indexing path isn't really exercised).
    assert not np.allclose(trans[0, :2], trans[0, 2:])


def test_no_trans_equals_zero_trans():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    rois = np.array([[0, 1.0, 1.0, 20.0, 20.0]], np.float32)
    kw = dict(spatial_scale=0.25, pooled_size=2, output_dim=4, group_size=1,
              part_size=2, sample_per_part=2, trans_std=0.3)
    a = dcn_v2_psroi_pooling(jnp.asarray(x), jnp.asarray(rois), None, **kw)
    z = jnp.zeros((1, 2, 2, 2), jnp.float32)
    b = dcn_v2_psroi_pooling(jnp.asarray(x), jnp.asarray(rois), z, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_constant_input_pools_to_constant():
    # Every in-range bin of a constant map averages to that constant; the
    # fully-out-of-range ROI row yields 0.
    x = np.full((1, 10, 10, 1), 3.5, np.float32)
    rois = np.array([[0, 0.0, 0.0, 36.0, 36.0],
                     [0, 200.0, 200.0, 240.0, 240.0]], np.float32)
    out = dcn_v2_psroi_pooling(
        jnp.asarray(x), jnp.asarray(rois), None, spatial_scale=0.25,
        pooled_size=2, output_dim=1, group_size=1, sample_per_part=2,
        trans_std=0.0)
    np.testing.assert_allclose(np.asarray(out[0]), 3.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), 0.0, atol=1e-6)
