"""Shared NHWC building blocks (flax.linen).

Parity targets: BasicBlock/Root/Tree from the reference DLA
(`src/lib/models/networks/pose_dla_dcn.py:34-224`), the DCN+BN+ReLU `DeformConv`
(`:377-389`), and the depthwise bilinear-initialized transposed-conv upsampler
(`:365-374,402-405`). All convs are NHWC/HWIO (TPU-native layout); BatchNorm uses
running statistics at inference like torch's eval mode.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from centerpose_tpu.ops.dcn import DCN_GRAD_CHUNK, dcn_v2

# torch BN(momentum=0.1) keeps 0.9 of the running stat per step.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


class ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm + optional ReLU."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class _S2DConvParam(nn.Module):
    """Declares an nn.Conv-compatible kernel param ('kernel') and returns it."""

    kshape: Sequence[int]

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), tuple(self.kshape)
        )


class _S2DBNParam(nn.Module):
    """Declares nn.BatchNorm-compatible params/stats and returns them."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        return scale, bias, mean.value, var.value


class S2DConvBN(nn.Module):
    """ConvBN evaluated in space-to-depth f=2 layout — identical param tree.

    Parameters are declared with the ORIGINAL shapes under the same names as
    ConvBN ('conv'/kernel + 'bn'/scale...), so checkpoints / the torch
    converter are layout-agnostic; the forward scatters the kernel into the
    exact S2D equivalent (ops/s2d.py) and repeats the BN affine per
    sub-position. Inference-only (running BN stats; no stat updates).

    mode: 's2d'  — stride-1 conv, S2D in → S2D out
          'exit' — the chain's stride-2 3x3 conv, S2D in → NORMAL out
    """

    features: int
    kernel: int
    in_features: int
    mode: str = "s2d"
    relu: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from centerpose_tpu.ops.s2d import (
            s2d_conv_kernel,
            s2d_exit_kernel,
            s2d_padding,
        )

        x = x.astype(self.dtype)  # match nn.Conv(dtype=...) input promotion
        w = _S2DConvParam(
            (self.kernel, self.kernel, self.in_features, self.features),
            name="conv",
        )()
        scale, bias, mean, var = _S2DBNParam(self.features, name="bn")()
        if self.mode == "exit":
            wt = s2d_exit_kernel(w)
            pad, reps = [(1, 0), (1, 0)], 1
        else:
            wt = s2d_conv_kernel(w)
            pad, reps = s2d_padding(self.kernel), 4
        y = jax.lax.conv_general_dilated(
            x, wt.astype(x.dtype), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        m = scale * jax.lax.rsqrt(var + BN_EPS)
        b = bias - mean * m
        if reps > 1:
            m, b = jnp.tile(m, reps), jnp.tile(b, reps)
        y = y * m.astype(y.dtype) + b.astype(y.dtype)
        return nn.relu(y) if self.relu else y


class BasicBlock(nn.Module):
    """Two 3x3 convs with a residual add (pose_dla_dcn.py:34-62)."""

    features: int
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        out = ConvBN(
            self.features, 3, self.stride, self.dilation, relu=True,
            dtype=self.dtype, name="conv1",
        )(x, train)
        out = ConvBN(
            self.features, 3, 1, self.dilation, relu=False,
            dtype=self.dtype, name="conv2",
        )(out, train)
        return nn.relu(out + residual)


class Root(nn.Module):
    """1x1 aggregation over concatenated children (pose_dla_dcn.py:150-168)."""

    features: int
    residual: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, children: Sequence[jnp.ndarray], train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = ConvBN(self.features, 1, relu=False, dtype=self.dtype, name="conv")(x, train)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Recursive deep-layer-aggregation tree (pose_dla_dcn.py:171-224)."""

    levels: int
    in_features: int
    features: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_residual: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, children=None, train: bool = False):
        root_dim = self.root_dim or 2 * self.features
        if self.level_root:
            root_dim += self.in_features
        children = [] if children is None else list(children)

        bottom = (
            nn.max_pool(x, (self.stride, self.stride), strides=(self.stride, self.stride))
            if self.stride > 1
            else x
        )
        if self.in_features != self.features:
            residual = ConvBN(
                self.features, 1, relu=False, dtype=self.dtype, name="project"
            )(bottom, train)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = BasicBlock(
                self.features, self.stride, dtype=self.dtype, name="tree1"
            )(x, residual, train)
            x2 = BasicBlock(self.features, 1, dtype=self.dtype, name="tree2")(
                x1, None, train
            )
            out = Root(
                self.features, self.root_residual, dtype=self.dtype, name="root"
            )([x2, x1] + children, train)
        else:
            x1 = Tree(
                self.levels - 1,
                self.in_features,
                self.features,
                self.stride,
                root_residual=self.root_residual,
                dtype=self.dtype,
                name="tree1",
            )(x, None, None, train)
            children.append(x1)
            out = Tree(
                self.levels - 1,
                self.features,
                self.features,
                1,
                root_dim=root_dim + self.features,
                root_residual=self.root_residual,
                dtype=self.dtype,
                name="tree2",
            )(x1, None, children, train)
        return out


def _batch_chunked(fn, x, offset, mask):
    """Apply fn(x, offset, mask) in DCN_GRAD_CHUNK-image batch chunks via
    lax.map (when the batch divides); bounds the per-layer im2col/backward
    transients the way the reference CUDA op's per-image loop does."""
    bsz, chunk = x.shape[0], DCN_GRAD_CHUNK
    if bsz > chunk and bsz % chunk == 0:
        n = bsz // chunk
        out = jax.lax.map(
            lambda t: fn(*t),
            (
                x.reshape(n, chunk, *x.shape[1:]),
                offset.reshape(n, chunk, *offset.shape[1:]),
                mask.reshape(n, chunk, *mask.shape[1:]),
            ),
        )
        return out.reshape(bsz, *out.shape[2:])
    return fn(x, offset, mask)


class DeformConvBlock(nn.Module):
    """DCNv2 (offset/mask from a zero-init conv) + BN + ReLU.

    Parity: `DCN` (DCNv2/dcn_v2.py:97-128; offset conv zero-init at :114-116 so the
    block starts as a plain 3x3 conv with 0.5 gates) wrapped by `DeformConv`
    (pose_dla_dcn.py:377-389).
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    dcn_impl: str = "gather"          # 'gather' (exact) | 'onehot' (MXU fast path)
    dcn_window_radius: int = 4
    dcn_remat: bool = True            # checkpoint+chunk the gather bwd (cfg.remat_dcn)
    dcn_bwd: str = "auto"             # 'auto'|'pallas'|'autodiff' (cfg.dcn_bwd)

    @nn.compact
    def __call__(self, x, train: bool = False):
        kk = 9
        om = nn.Conv(
            3 * kk,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv_offset_mask",
        )(x)
        offset = om[..., : 2 * kk]
        mask = jax.nn.sigmoid(om[..., 2 * kk :])

        cin = x.shape[-1]
        # Kaiming-uniform fan-in init, matching torch Conv2d's default reset.
        bound = 1.0 / math.sqrt(cin * kk)

        def w_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        weight = self.param("weight", w_init, (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if self.dcn_impl in ("onehot", "onehot_exact"):
            from centerpose_tpu.ops.dcn_onehot import dcn_v2_onehot

            x = dcn_v2_onehot(
                x, offset, mask, weight.astype(self.dtype),
                bias.astype(self.dtype), self.dcn_window_radius,
                self.dcn_impl == "onehot_exact",
            )
        else:
            # Training-memory parity with the reference CUDA op, which loops
            # the batch and RECOMPUTES im2col in backward (dcn_v2_cuda.cu):
            # naive autodiff over the gather impl instead saves every layer's
            # [B·HW, 4C] im2col matrix (measured 32.25G HBM for a 512² b16
            # train step — 2x one v5e), and even rematted, one layer's
            # backward transients peak at ~8G. Remat + batch-chunked lax.map
            # bounds the transient to a 4-image chunk. Zero cost to the jitted
            # forward at inference (remat is grad-only; map unrolls nothing
            # extra — gathers are latency-bound either way).
            wc = weight.astype(self.dtype)
            bc = bias.astype(self.dtype)
            kernel_bwd = False
            # 'auto' engages only on real TPUs: on CPU the kernels run in
            # Pallas interpret mode (a per-program python loop — the 512²
            # dryrun would take hours). 'pallas' forces it anywhere (tests).
            want_kernel = self.dcn_bwd == "pallas" or (
                self.dcn_bwd == "auto" and jax.default_backend() != "cpu"
            )
            if train and want_kernel:
                # Pallas MXU kernel backward (ops/dcn_bwd.py): the autodiff
                # VJP of the gather forward is scatter-bound (measured 191 ms
                # fwd+vjp per 128² C64 b16 layer vs ~14 ms for the kernels'
                # matmuls) AND im2col-residual-hungry (the reason remat +
                # 4-image chunking exist). The kernels save only (x, offset,
                # mask) and need neither.
                from centerpose_tpu.ops.dcn_bwd import (
                    dcn_bwd_supported,
                    dcn_v2_kgrad,
                )

                supported = dcn_bwd_supported(
                    x.shape, (3, 3, x.shape[-1], self.features),
                    itemsize=jnp.dtype(self.dtype).itemsize,
                )
                if self.dcn_bwd == "pallas":
                    assert supported, (x.shape, self.features)
                if supported:
                    kernel_bwd = True
                    # Chunked too: the kernels save only (x, offset, mask),
                    # but the gather FORWARD's whole-batch [B·HW·9, 4C] f32
                    # im2col transient alone re-OOMed the 512² b16 step
                    # (measured +515M over HBM); per-chunk it's 4x smaller.
                    # The backward kernels run per chunk with the same total
                    # program count.
                    kfn = lambda x_, o_, m_: dcn_v2_kgrad(
                        x_, o_, m_, wc, bc, None
                    )
                    x = _batch_chunked(kfn, x, offset, mask)
            if not kernel_bwd:
                dcn = lambda x_, o_, m_: dcn_v2(x_, o_, m_, wc, bc)
                # Only the TRAINING forward needs the memory bound; the
                # serving forward keeps the whole-batch gather (no grad, no
                # residuals).
                use_remat = self.dcn_remat and train
                if use_remat:
                    dcn = jax.checkpoint(dcn)
                if use_remat:
                    x = _batch_chunked(dcn, x, offset, mask)
                else:
                    x = dcn(x, offset, mask)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.relu(x)


def _bilinear_upsample_kernel(factor: int) -> jnp.ndarray:
    """(2f, 2f) bilinear interpolation kernel — the reference's `fill_up_weights`
    (pose_dla_dcn.py:365-374)."""
    size = factor * 2
    f = math.ceil(size / 2)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    r = jnp.arange(size, dtype=jnp.float32)
    k1 = 1 - jnp.abs(r / f - c)
    return k1[:, None] * k1[None, :]


class UpsampleConv(nn.Module):
    """Depthwise transposed conv x`factor`, bilinear-initialized but trainable.

    Parity: nn.ConvTranspose2d(o, o, f*2, stride=f, padding=f//2, groups=o,
    bias=False) + fill_up_weights (pose_dla_dcn.py:402-405). Implemented as an
    lhs-dilated depthwise convolution (identical math, XLA-native).
    """

    factor: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.factor
        c = x.shape[-1]
        size = 2 * f

        def init(key, shape, dtype=jnp.float32):
            k = _bilinear_upsample_kernel(f)
            return jnp.broadcast_to(k[:, :, None, None], shape).astype(dtype)

        # HWIO with I=1 (depthwise): [2f, 2f, 1, C]
        kernel = self.param("kernel", init, (size, size, 1, c))

        # Transposed conv == conv over f-dilated input with spatially flipped
        # kernel and padding (K - 1 - pad) per side.
        pad = size - 1 - f // 2
        flipped = kernel[::-1, ::-1].astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            flipped,
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            lhs_dilation=(f, f),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )


class TorchConvTranspose(nn.Module):
    """Full (non-depthwise) transposed conv matching
    nn.ConvTranspose2d(cin, features, kernel, stride, padding, bias=False).

    The kernel is stored HWIO as [k, k, cin, features] (torch stores
    [cin, features, k, k]); apply-time spatial flip + lhs dilation realizes the
    transposed conv as a normal XLA convolution (MXU-friendly). Used by the
    ResNet deconv stages (msra_resnet.py:212-228, resnet_dcn.py:232-247)."""

    features: int
    kernel: int = 4
    stride: int = 2
    padding: int = 1
    bilinear_init: bool = False  # resnet_dcn fill_up_weights-style init
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        cin = x.shape[-1]

        def init(key, shape, dtype=jnp.float32):
            if self.bilinear_init:
                # fill_up_weights on a [cin, cout, k, k] tensor writes the
                # bilinear stencil into w[c, 0] for every input channel c
                # (resnet_dcn.py:22-31): only output channel 0 is non-zero.
                bl = _bilinear_upsample_kernel(k // 2)
                w = jnp.zeros(shape, dtype)
                return w.at[:, :, :, 0].set(bl[:, :, None])
            fan_in = cin * k * k
            bound = 1.0 / math.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", init, (k, k, cin, self.features))
        pad = k - 1 - self.padding
        flipped = kernel[::-1, ::-1].astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            flipped,
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class SplitHeadConv(nn.Module):
    """HeadConv split into conv1-params + finish, enabling cross-head fusion.

    Same parameter tree as HeadConv ({head}/conv1, {head}/gn, {head}/out);
    the caller concatenates several heads' conv1 kernels into ONE wide conv
    over the shared feature (single feature read, full MXU lanes), then feeds
    each head's slice to `finish` (GN -> ReLU -> 1x1 out conv). Requires
    head_conv > 0 (callers keep HeadConv otherwise).
    """

    classes: int
    head_conv: int = 256
    use_gn: bool = False
    bias_init_value: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.conv1 = _HeadConv1Param()
        if self.use_gn:
            self.gn = nn.GroupNorm(
                num_groups=32 if self.head_conv % 32 == 0 else 16,
                epsilon=1e-5, dtype=self.dtype,
            )
        self.out = nn.Conv(
            self.classes,
            (1, 1),
            bias_init=nn.initializers.constant(self.bias_init_value),
            dtype=self.dtype,
        )

    def conv1_params(self, in_features: int):
        """(kernel [3,3,cin,head_conv], bias [head_conv]) of the 3x3 conv."""
        return self.conv1((3, 3, in_features, self.head_conv))

    def __call__(self, y):
        """`finish`: y is this head's slice of the fused conv1 output."""
        if self.use_gn:
            y = self.gn(y)
        y = nn.relu(y)
        return self.out(y)


class _HeadConv1Param(nn.Module):
    """nn.Conv-compatible kernel+bias declaration (shape given at call)."""

    @nn.compact
    def __call__(self, shape):
        k = self.param("kernel", nn.initializers.lecun_normal(), tuple(shape))
        b = self.param("bias", nn.initializers.zeros, (shape[-1],))
        return k, b


class HeadConv(nn.Module):
    """Prediction head: 3x3 conv -> [GroupNorm] -> ReLU -> 1x1 conv.

    Parity: DLASeg head construction (pose_dla_dcn.py:491-521). Heatmap heads get a
    -2.19 output-bias init (focal-loss prior); GroupNorm(32) is inserted when the
    convGRU chain is active (GN.py:4-9).
    """

    classes: int
    head_conv: int = 256
    use_gn: bool = False
    bias_init_value: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.head_conv > 0:
            x = nn.Conv(
                self.head_conv, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                name="conv1",
            )(x)
            if self.use_gn:
                groups = 32 if self.head_conv % 32 == 0 else 16
                # torch GroupNorm eps is 1e-5 (flax defaults to 1e-6).
                x = nn.GroupNorm(
                    num_groups=groups, epsilon=1e-5, dtype=self.dtype, name="gn"
                )(x)
            x = nn.relu(x)
        # head_conv <= 0: single 1x1 conv head (pose_dla_dcn.py:513-520).
        x = nn.Conv(
            self.classes,
            (1, 1),
            bias_init=nn.initializers.constant(self.bias_init_value),
            dtype=self.dtype,
            name="out",
        )(x)
        return x
