"""Pallas DCN backward kernels vs jax.vjp of the exact gather forward.

The kernels (ops/dcn_bwd.py) must reproduce every cotangent of
ops/dcn.py::dcn_v2 — including boundary samples (corners off the image),
far-out offsets (everything off), integer offsets (the at-init case, where
the corner derivative is one-sided), and the mask/weight/bias terms.
CPU runs the kernels in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centerpose_tpu.ops.dcn import dcn_v2
from centerpose_tpu.ops.dcn_bwd import (
    dcn_bwd_supported,
    dcn_v2_grads,
    dcn_v2_kgrad,
)

NAMES = ("dx", "doffset", "dmask", "dweight", "dbias")


def _inputs(rng, b, h, w, c, co, off_scale, integer_offsets=False):
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    if integer_offsets:
        off = jnp.asarray(
            rng.randint(-2, 3, size=(b, h, w, 18)).astype(np.float32)
        )
    else:
        off = jnp.asarray(off_scale * rng.randn(b, h, w, 18).astype(np.float32))
        # Keep strictly away from integer coordinates: autodiff subgradient
        # choices at exact corner ties are implementation-defined.
        frac = off - jnp.floor(off)
        off = jnp.floor(off) + jnp.clip(frac, 0.07, 0.93)
    m = jnp.asarray(rng.rand(b, h, w, 9).astype(np.float32))
    wt = jnp.asarray(0.3 * rng.randn(3, 3, c, co).astype(np.float32))
    bi = jnp.asarray(0.1 * rng.randn(co).astype(np.float32))
    g = jnp.asarray(rng.randn(b, h, w, co).astype(np.float32))
    return x, off, m, wt, bi, g


def _ref_grads(x, off, m, wt, bi, g):
    _, vjp = jax.vjp(
        lambda *a: dcn_v2(*a, stride=1, padding=1, dilation=1),
        x, off, m, wt, bi,
    )
    return vjp(g)


@pytest.mark.parametrize("fused", [True, False])
@pytest.mark.parametrize(
    "b,h,w,c,co,off_scale,integer",
    [
        (2, 8, 16, 8, 8, 0.9, False),       # generic small offsets
        (1, 16, 16, 8, 16, 3.5, False),     # multi-row windows, C != Co
        (2, 8, 16, 8, 8, 25.0, False),      # most samples fully off-image
        (2, 8, 16, 8, 8, 0.0, True),        # integer offsets (at-init case)
        (1, 8, 16, 32, 8, 1.1, False),      # C > W: the w<c fold path
        (1, 8, 16, 32, 8, 25.0, False),     # C > W, mostly off-image (gated
                                            # peel on the y-hat side input)
        (1, 8, 16, 32, 8, 0.0, True),       # C > W, integer offsets
        (1, 32, 8, 32, 8, 3.5, False),      # C > W, multi-group row loop
                                            # (pr=16, two groups, wide
                                            # windows spanning group edges)
        (1, 12, 24, 16, 8, 1.2, False),     # non-pow2 H/W (g=6, gw=144) - skip
    ],
)
def test_grads_match_autodiff(b, h, w, c, co, off_scale, integer, fused):
    if dcn_bwd_supported((b, h, w, c), (3, 3, c, co)) == 0:
        pytest.skip("shape unsupported by the kernel backward")
    rng = np.random.RandomState(hash((b, h, w, c, co)) % 2**31)
    x, off, m, wt, bi, g = _inputs(rng, b, h, w, c, co, off_scale, integer)
    ref = _ref_grads(x, off, m, wt, bi, g)
    got = dcn_v2_grads(x, off, m, wt, bi, g, fused=fused)
    for name, r, k in zip(NAMES, ref, got):
        np.testing.assert_allclose(
            np.asarray(k), np.asarray(r), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )


def test_zero_offsets_match_plain_conv_grads():
    # offset == 0, mask == 1: gradients must equal a plain 3x3 conv's.
    rng = np.random.RandomState(0)
    b, h, w, c, co = 2, 8, 16, 8, 8
    x, _, _, wt, bi, g = _inputs(rng, b, h, w, c, co, 0.0)
    off = jnp.zeros((b, h, w, 18), jnp.float32)
    m = jnp.ones((b, h, w, 9), jnp.float32)
    ref = _ref_grads(x, off, m, wt, bi, g)
    got = dcn_v2_grads(x, off, m, wt, bi, g)
    for name, r, k in zip(NAMES, ref, got):
        np.testing.assert_allclose(
            np.asarray(k), np.asarray(r), rtol=2e-4, atol=2e-4, err_msg=name,
        )


def test_kgrad_value_and_grad():
    # The custom-vjp wrapper: identical forward values, kernel gradients.
    rng = np.random.RandomState(7)
    b, h, w, c, co = 2, 8, 16, 8, 8
    x, off, m, wt, bi, g = _inputs(rng, b, h, w, c, co, 1.1)

    out_ref = dcn_v2(x, off, m, wt, bi, stride=1, padding=1, dilation=1)
    out_k = dcn_v2_kgrad(x, off, m, wt, bi)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)

    def loss_k(*a):
        return jnp.sum(dcn_v2_kgrad(*a) * g)

    def loss_ref(*a):
        return jnp.sum(
            dcn_v2(*a, stride=1, padding=1, dilation=1) * g
        )

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(x, off, m, wt, bi)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, off, m, wt, bi)
    for name, r, k in zip(NAMES, gr, gk):
        np.testing.assert_allclose(
            np.asarray(k), np.asarray(r), rtol=2e-4, atol=2e-4, err_msg=name,
        )


def test_bf16_compute_dtype_close():
    # compute_dtype=bfloat16 on f32 primals: reductions stay f32-accumulated,
    # so the grads track the f32 reference within bf16 operand noise.
    rng = np.random.RandomState(3)
    b, h, w, c, co = 2, 8, 16, 8, 8
    x, off, m, wt, bi, g = _inputs(rng, b, h, w, c, co, 1.0)
    ref = _ref_grads(x, off, m, wt, bi, g)
    got = dcn_v2_grads(x, off, m, wt, bi, g, compute_dtype=jnp.bfloat16)
    for name, r, k in zip(NAMES, ref, got):
        r = np.asarray(r)
        scale = max(1.0, float(np.abs(r).max()))
        np.testing.assert_allclose(
            np.asarray(k) / scale, r / scale, atol=0.05, err_msg=name,
        )


def test_deform_conv_block_pallas_bwd_matches_autodiff():
    # layers.py wiring: dcn_bwd='pallas' forces the kernel backward through
    # DeformConvBlock (interpret mode on CPU); grads must match the
    # 'autodiff' path on the same params/batch.
    import flax.linen as nn

    from centerpose_tpu.models.layers import DeformConvBlock

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 8, 16, 8).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 8, 16, 8).astype(np.float32))

    def build(dcn_bwd):
        return DeformConvBlock(features=8, dcn_bwd=dcn_bwd)

    params = build("autodiff").init(jax.random.PRNGKey(0), x, True)

    def loss(variables, mode):
        out, _ = build(mode).apply(
            variables, x, True, mutable=["batch_stats"]
        )
        return jnp.sum(out * g)

    # Perturb the offset conv so the DCN samples off-integer positions.
    import jax.tree_util as jtu

    params = jtu.tree_map(
        lambda v: v + 0.05 * np.random.RandomState(3).randn(*v.shape).astype(
            v.dtype
        ),
        params,
    )
    g_ref = jax.grad(loss)(params, "autodiff")
    g_pal = jax.grad(loss)(params, "pallas")
    flat_r, _ = jtu.tree_flatten(g_ref)
    flat_p, _ = jtu.tree_flatten(g_pal)
    for r, p in zip(flat_r, flat_p):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(r), rtol=5e-4, atol=5e-4
        )


def test_unsupported_shapes_report_zero():
    assert dcn_bwd_supported((1, 8, 200, 8), (3, 3, 8, 8)) == 0   # W > 128
    assert dcn_bwd_supported((1, 8, 16, 6), (3, 3, 6, 8)) == 0    # C % 8
    assert dcn_bwd_supported((1, 7, 16, 8), (3, 3, 8, 8)) == 0    # no G | H
    assert dcn_bwd_supported((1, 8, 16, 8), (5, 5, 8, 8)) == 0    # 5x5
    # The production 128² C64 layer fits with bf16 operands (the TPU
    # resolution for f32 primals sizes with itemsize 2); true-f32 residents
    # exceed the 16M scoped-vmem limit (measured 16.07M at G=1).
    assert dcn_bwd_supported((8, 128, 128, 64), (3, 3, 64, 64), itemsize=2) > 0
