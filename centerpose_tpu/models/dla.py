"""DLA-34 backbone and the DCN upsampling neck, NHWC flax modules.

Parity targets: `DLA` (pose_dla_dcn.py:227-346: base 7x7 stem, two conv levels, four
Tree stages with levels=[1,1,1,2,2,1] and channels=[16,32,64,128,256,512]), the
CenterTrack-style early-fusion stems for pre_img/pre_hm/pre_hm_hp (:253-271,310-322),
`DLAUp` iterative deep aggregation (:420-443), and `IDAUp` (:392-417: DCN proj →
bilinear-init depthwise transposed-conv upsample → DCN node merge).

The exact `dlav0` neck (dlav0.py:469-555) is `IDAUpV0`/`DLAUpV0`: 1x1 conv
projections, all levels upsampled to the shallowest stride FIRST, then 3x3
CONCAT-node merges (the dlav1 neck merges by sum at each step instead); the
dlav0 trunk is byte-identical to the dlav1 trunk (only BN momentum spelling
differs), so `DLA` is shared.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from centerpose_tpu.models.layers import (
    BasicBlock,
    ConvBN,
    DeformConvBlock,
    S2DConvBN,
    Tree,
    UpsampleConv,
)
from centerpose_tpu.ops.s2d import depth_to_space, space_to_depth

DLA34_LEVELS = (1, 1, 1, 2, 2, 1)
DLA34_CHANNELS = (16, 32, 64, 128, 256, 512)


class _Stem(nn.Module):
    """7x7 stride-1 conv stem (pose_dla_dcn.py:234-238)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBN(self.features, 7, 1, relu=True, dtype=self.dtype, name="conv")(
            x, train
        )


class _ConvLevel(nn.Module):
    """`_make_conv_level`: n x (3x3 conv + BN + ReLU), stride on the first."""

    features: int
    convs: int = 1
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.convs):
            x = ConvBN(
                self.features,
                3,
                self.stride if i == 0 else 1,
                relu=True,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x, train)
        return x


class _S2DStem(nn.Module):
    """S2D-layout twin of `_Stem` — same param tree (see layers.S2DConvBN)."""

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return S2DConvBN(
            self.features, 7, self.in_features, mode="s2d", dtype=self.dtype,
            name="conv",
        )(x)


class _S2DConvLevel(nn.Module):
    """S2D-layout twin of a 1-conv `_ConvLevel`; `exit_stride2` maps the
    stride-2 level back to the normal layout."""

    features: int
    in_features: int
    exit_stride2: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return S2DConvBN(
            self.features, 3, self.in_features,
            mode="exit" if self.exit_stride2 else "s2d",
            dtype=self.dtype, name="conv0",
        )(x)


class DLA(nn.Module):
    """DLA-34 trunk returning the 6 per-level feature maps (strides 1..32)."""

    levels: Sequence[int] = DLA34_LEVELS
    channels: Sequence[int] = DLA34_CHANNELS
    with_pre_img: bool = False
    with_pre_hm: bool = False
    with_pre_hm_hp: bool = False
    remat_stem: bool = True           # cfg.remat_stem (see NOTES_PERF round 2f)
    s2d_stem: bool = False            # cfg.s2d_stem (inference-only S2D chain)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        pre_img=None,
        pre_hm=None,
        pre_hm_hp=None,
        train: bool = False,
    ) -> List[jnp.ndarray]:
        ch = self.channels
        # Remat the low-channel full-res stages: XLA stores their f32
        # activations C-padded to the 128-lane tile (8x expansion — the
        # 512²x16 level0 residual alone is 2G at b16), which together with the
        # DCN im2col buffers overflows a single v5e's 15.75G in training.
        # Recomputing them in backward costs ~1% step time; free at inference.
        # (static_argnums: 0 is self in flax's nn.remat.)
        # Inference-only exact space-to-depth stem chain (ops/s2d.py): the
        # C=16 @512² stages run <5% MXU utilization in the plain layout
        # (~10.8 ms of an 80 ms b32 step). The plain path still runs at init
        # (creating the identical param tree) and in training.
        use_s2d = (
            self.s2d_stem
            and not train
            and not self.is_initializing()
            and self.levels[0] == 1
            and self.levels[1] == 1
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        )
        if use_s2d:
            xs = space_to_depth(x, 2)
            x = _S2DStem(ch[0], 3, dtype=self.dtype, name="base_layer")(xs)
            for flag, inp, name in (
                (self.with_pre_img, pre_img, "pre_img_layer"),
                (self.with_pre_hm, pre_hm, "pre_hm_layer"),
                (self.with_pre_hm_hp, pre_hm_hp, "pre_hm_hp_layer"),
            ):
                if flag and inp is not None:
                    x = x + _S2DStem(
                        ch[0], inp.shape[-1], dtype=self.dtype, name=name
                    )(space_to_depth(inp, 2))
            outs = []
            x = _S2DConvLevel(ch[0], ch[0], dtype=self.dtype, name="level0")(x)
            # level0's stride-1 map is only consumed by level1 here; the
            # un-transform below is dead code unless a caller reads outs[0]
            # (XLA removes it otherwise).
            outs.append(depth_to_space(x, 2))
            x = _S2DConvLevel(
                ch[1], ch[0], exit_stride2=True, dtype=self.dtype, name="level1"
            )(x)
            outs.append(x)
        else:
            if self.remat_stem:
                stem = nn.remat(_Stem, static_argnums=(2,))
                conv_level = nn.remat(_ConvLevel, static_argnums=(2,))
            else:
                stem, conv_level = _Stem, _ConvLevel
            x = stem(ch[0], dtype=self.dtype, name="base_layer")(x, train)
            if self.with_pre_img and pre_img is not None:
                x = x + stem(ch[0], dtype=self.dtype, name="pre_img_layer")(
                    pre_img, train
                )
            if self.with_pre_hm and pre_hm is not None:
                x = x + stem(ch[0], dtype=self.dtype, name="pre_hm_layer")(
                    pre_hm, train
                )
            if self.with_pre_hm_hp and pre_hm_hp is not None:
                x = x + stem(ch[0], dtype=self.dtype, name="pre_hm_hp_layer")(
                    pre_hm_hp, train
                )

            outs = []
            x = conv_level(
                ch[0], self.levels[0], 1, dtype=self.dtype, name="level0"
            )(x, train)
            outs.append(x)
            x = conv_level(
                ch[1], self.levels[1], 2, dtype=self.dtype, name="level1"
            )(x, train)
            outs.append(x)
        x = Tree(
            self.levels[2], ch[1], ch[2], 2, level_root=False, dtype=self.dtype,
            name="level2",
        )(x, train=train)
        outs.append(x)
        x = Tree(
            self.levels[3], ch[2], ch[3], 2, level_root=True, dtype=self.dtype,
            name="level3",
        )(x, train=train)
        outs.append(x)
        x = Tree(
            self.levels[4], ch[3], ch[4], 2, level_root=True, dtype=self.dtype,
            name="level4",
        )(x, train=train)
        outs.append(x)
        x = Tree(
            self.levels[5], ch[4], ch[5], 2, level_root=True, dtype=self.dtype,
            name="level5",
        )(x, train=train)
        outs.append(x)
        return outs


class IDAUpV0(nn.Module):
    """dlav0-style iterative deep aggregation (dlav0.py:469-525).

    All levels are first brought to `out_dim` channels (1x1 conv+BN+ReLU when the
    channel count differs; Identity otherwise) and to the shallowest stride via a
    bilinear-initialized depthwise transposed conv, THEN chained through 3x3
    conv+BN+ReLU nodes over channel-CONCATenated pairs:
        x = layers[0];  x = node_i(cat[x, layers[i]])  for i = 1..n-1
    Returns (x, [node outputs]) like the reference forward.
    """

    out_dim: int
    channels: Sequence[int]
    up_factors: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, layers: Sequence[jnp.ndarray], train: bool = False):
        assert len(layers) == len(self.channels)
        layers = list(layers)
        for i, c in enumerate(self.channels):
            x = layers[i]
            if c != self.out_dim:
                x = ConvBN(
                    self.out_dim, 1, relu=True, dtype=self.dtype, name=f"proj_{i}"
                )(x, train)
            f = int(self.up_factors[i])
            if f > 1:
                x = UpsampleConv(f, dtype=self.dtype, name=f"up_{i}")(x)
            layers[i] = x
        x = layers[0]
        y = []
        for i in range(1, len(layers)):
            x = ConvBN(
                self.out_dim, 3, relu=True, dtype=self.dtype, name=f"node_{i}"
            )(jnp.concatenate([x, layers[i]], axis=-1), train)
            y.append(x)
        return x, y


class DLAUpV0(nn.Module):
    """dlav0-style pyramid aggregation (dlav0.py:528-555): repeatedly IDA the
    deepest slice, replacing the deeper levels with the node outputs; returns the
    single stride-4 aggregate (the reference DLASeg consumes only `x`)."""

    channels: Sequence[int]  # channels[first_level:], e.g. (64, 128, 256, 512)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, layers: Sequence[jnp.ndarray], train: bool = False):
        layers = list(layers)
        channels = list(self.channels)
        scales = np.array([2 ** i for i in range(len(channels))], dtype=int)
        in_channels = list(channels)
        x = layers[-1]
        for i in range(len(channels) - 1):
            j = -i - 2
            ida = IDAUpV0(
                channels[j],
                in_channels[j:],
                (scales[j:] // scales[j]).tolist(),
                dtype=self.dtype,
                name=f"ida_{i}",
            )
            x, y = ida(layers[j:], train)
            layers[-i - 1:] = y
            scales[j + 1:] = scales[j]
            in_channels[j + 1:] = [channels[j]] * len(in_channels[j + 1:])
        return x


class _ProjUpNode(nn.Module):
    """One IDAUp step for one level: proj -> upsample x f -> node(merge + skip)."""

    features: int
    factor: int
    deformable: bool = True
    dtype: jnp.dtype = jnp.float32
    dcn_impl: str = "gather"
    dcn_window_radius: int = 4
    dcn_remat: bool = True
    dcn_bwd: str = "auto"

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        if self.deformable:
            x = DeformConvBlock(
                self.features, dtype=self.dtype, dcn_impl=self.dcn_impl,
                dcn_window_radius=self.dcn_window_radius,
                dcn_remat=self.dcn_remat, dcn_bwd=self.dcn_bwd, name="proj",
            )(x, train)
        else:
            x = ConvBN(self.features, 1, relu=True, dtype=self.dtype, name="proj")(
                x, train
            )
        if self.factor > 1:
            x = UpsampleConv(self.factor, dtype=self.dtype, name="up")(x)
        if self.deformable:
            x = DeformConvBlock(
                self.features, dtype=self.dtype, dcn_impl=self.dcn_impl,
                dcn_window_radius=self.dcn_window_radius,
                dcn_remat=self.dcn_remat, dcn_bwd=self.dcn_bwd, name="node",
            )(x + skip, train)
        else:
            x = ConvBN(self.features, 3, relu=True, dtype=self.dtype, name="node")(
                x + skip, train
            )
        return x


class IDAUp(nn.Module):
    """Iterative deep aggregation across a pyramid slice (pose_dla_dcn.py:392-417).

    Given feature maps `layers[startp..endp)` ordered shallow→deep, each deeper map
    is projected, upsampled to the shallower stride, and merged through a node DCN
    with the running aggregate. Returns the new per-level list (functional — no
    in-place list mutation like the reference).
    """

    features: int
    up_factors: Sequence[int]  # per level, factor to reach the shallowest stride
    deformable: bool = True
    dtype: jnp.dtype = jnp.float32
    dcn_impl: str = "gather"
    dcn_window_radius: int = 4
    dcn_remat: bool = True
    dcn_bwd: str = "auto"

    @nn.compact
    def __call__(self, layers: Sequence[jnp.ndarray], train: bool = False):
        out = [layers[0]]
        for i in range(1, len(layers)):
            merged = _ProjUpNode(
                self.features,
                int(self.up_factors[i]),
                deformable=self.deformable,
                dtype=self.dtype,
                dcn_impl=self.dcn_impl,
                dcn_window_radius=self.dcn_window_radius,
                dcn_remat=self.dcn_remat, dcn_bwd=self.dcn_bwd,
                name=f"stage_{i}",
            )(layers[i], out[i - 1], train)
            out.append(merged)
        return out


class DLAUp(nn.Module):
    """Full pyramid aggregation (pose_dla_dcn.py:420-443).

    Repeatedly applies IDAUp to the deepest remaining slice, producing a list of
    aggregated maps [stride 4, 8, 16, 32] for first_level=2.
    """

    channels: Sequence[int]  # channels[first_level:], e.g. (64, 128, 256, 512)
    deformable: bool = True
    dtype: jnp.dtype = jnp.float32
    dcn_impl: str = "gather"
    dcn_window_radius: int = 4
    dcn_remat: bool = True
    dcn_bwd: str = "auto"

    @nn.compact
    def __call__(self, layers: Sequence[jnp.ndarray], train: bool = False):
        layers = list(layers)
        channels = list(self.channels)
        scales = np.array([2 ** i for i in range(len(channels))], dtype=int)
        in_channels = list(channels)
        out = [layers[-1]]
        for i in range(len(channels) - 1):
            j = -i - 2
            ida = IDAUp(
                channels[j],
                (scales[j:] // scales[j]).tolist(),
                deformable=self.deformable,
                dtype=self.dtype,
                dcn_impl=self.dcn_impl,
                dcn_window_radius=self.dcn_window_radius,
                name=f"ida_{i}",
            )
            new_tail = ida(layers[j:], train)
            layers[j:] = new_tail
            scales[j + 1 :] = scales[j]
            in_channels[j + 1 :] = [channels[j]] * len(in_channels[j + 1 :])
            out.insert(0, layers[-1])
        return out
