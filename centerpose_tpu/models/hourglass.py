"""Stacked hourglass backbone (`hourglass` arch).

Parity target: the CornerNet large hourglass (src/lib/models/networks/
large_hourglass.py:190-314): 2 stacks, 5-level recursive hourglass modules with
dims (256, 256, 384, 384, 384, 512), residual pre/post layers, intermediate
supervision — every stack emits a full head dict and the reference trains on all
stacks (num_stacks=2). Convolutions use BN+ReLU residual blocks.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from centerpose_tpu.config import CenterPoseConfig
from centerpose_tpu.models.layers import ConvBN, HeadConv

DIMS = (256, 256, 384, 384, 384, 512)
MODULES = (2, 2, 2, 2, 2, 4)


class _Residual(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        skip = x
        out = ConvBN(self.features, 3, self.stride, relu=True, dtype=self.dtype,
                     name="conv1")(x, train)
        out = ConvBN(self.features, 3, 1, relu=False, dtype=self.dtype,
                     name="conv2")(out, train)
        if skip.shape[-1] != self.features or self.stride != 1:
            skip = ConvBN(self.features, 1, self.stride, relu=False,
                          dtype=self.dtype, name="skip")(x, train)
        return nn.relu(out + skip)


class _HourglassModule(nn.Module):
    """Recursive hourglass: down → recurse → up + skip."""

    level: int  # 5 at the top
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        n = self.level
        dim_cur = DIMS[5 - n]
        dim_next = DIMS[5 - n + 1]
        mod_cur = MODULES[5 - n]

        up = x
        for i in range(mod_cur):
            up = _Residual(dim_cur, dtype=self.dtype, name=f"up_{i}")(up, train)

        low = nn.max_pool(x, (2, 2), strides=(2, 2))
        for i in range(mod_cur):
            low = _Residual(dim_next, dtype=self.dtype, name=f"low1_{i}")(low, train)

        if n > 1:
            low = _HourglassModule(n - 1, dtype=self.dtype, name="inner")(low, train)
        else:
            for i in range(MODULES[5]):
                low = _Residual(dim_next, dtype=self.dtype, name=f"mid_{i}")(
                    low, train
                )

        for i in range(mod_cur):
            low = _Residual(dim_cur, dtype=self.dtype, name=f"low2_{i}")(low, train)

        # Nearest-neighbor x2 upsample (CornerNet uses nn.Upsample).
        b, h, w, c = low.shape
        up2 = jnp.repeat(jnp.repeat(low, 2, axis=1), 2, axis=2)
        return up + up2


class HourglassNet(nn.Module):
    """2-stack hourglass with intermediate supervision; returns the LAST stack's
    heads (training uses all stacks — exposed via `return_all_stacks`)."""

    config: CenterPoseConfig
    num_stacks: int = 2
    return_all_stacks: bool = False

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, pre_hm_hp=None, train=False):
        del pre_img, pre_hm, pre_hm_hp
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)

        # Pre: 7x7 s2 conv + residual s2 → stride 4.
        x = ConvBN(128, 7, 2, relu=True, dtype=dtype, name="pre_conv")(x, train)
        x = _Residual(256, 2, dtype=dtype, name="pre_res")(x, train)

        outs: List[Dict[str, jnp.ndarray]] = []
        inter = x
        for s in range(self.num_stacks):
            hg = _HourglassModule(5, dtype=dtype, name=f"hg_{s}")(inter, train)
            feat = ConvBN(256, 3, relu=True, dtype=dtype, name=f"feat_{s}")(hg, train)

            heads: Dict[str, jnp.ndarray] = {}
            for head, classes in cfg.heads.items():
                bias0 = -2.19 if "hm" in head else 0.0
                heads[head] = HeadConv(
                    classes, cfg.head_conv, use_gn=False, bias_init_value=bias0,
                    dtype=dtype, name=f"{head}_{s}",
                )(feat)
            outs.append(heads)

            if s < self.num_stacks - 1:
                inter_a = ConvBN(256, 1, relu=False, dtype=dtype,
                                 name=f"inter_a_{s}")(inter, train)
                inter_b = ConvBN(256, 1, relu=False, dtype=dtype,
                                 name=f"inter_b_{s}")(feat, train)
                inter = nn.relu(inter_a + inter_b)
                inter = _Residual(256, dtype=dtype, name=f"inter_res_{s}")(inter, train)

        if self.return_all_stacks:
            return outs
        return outs[-1]
