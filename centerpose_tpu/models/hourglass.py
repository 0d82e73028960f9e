"""Stacked hourglass backbone (`hourglass` arch).

Parity target: the CornerNet large hourglass (src/lib/models/networks/
large_hourglass.py:128-314): 2 stacks, 5-level recursive `kp_module`s with
dims (256, 256, 384, 384, 384, 512) and modules (2, 2, 2, 2, 2, 4).

Structural details that matter for weight conversion:
  * downsampling is a STRIDE-2 residual as the first `low1` block
    (`make_hg_layer`, :290-293) — the pool layer is an identity (:104-105);
  * `low3` is `make_layer_revr` (:88-93): (mod-1) residuals at the inner dim,
    then ONE residual mapping inner→outer;
  * heads are make_kp_layer(cnv_dim=256, curr_dim=256, out) — a 3x3
    conv(bias)+ReLU at 256 channels then a 1x1 conv, independent of the
    config's head_conv (get_large_hourglass_net ignores head_conv, :312-314);
  * every stack emits a full head dict; training supervises all stacks.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
from flax import linen as nn

from centerpose_tpu.config import CenterPoseConfig
from centerpose_tpu.models.layers import ConvBN, HeadConv

DIMS = (256, 256, 384, 384, 384, 512)
MODULES = (2, 2, 2, 2, 2, 4)


class _Residual(nn.Module):
    """CornerNet residual (large_hourglass.py:50-77): conv3x3(s)+BN+ReLU,
    conv3x3+BN, skip 1x1conv+BN when shape changes, ReLU(sum)."""

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
    """Recursive kp_module (large_hourglass.py:128-187)."""

    level: int  # 5 at the top
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        n = self.level
        depth = 5 - n
        curr_dim = DIMS[depth]
        next_dim = DIMS[depth + 1]
        curr_mod = MODULES[depth]
        next_mod = MODULES[depth + 1]

        up = x
        for i in range(curr_mod):
            up = _Residual(curr_dim, dtype=self.dtype, name=f"up1_{i}")(up, train)

        # make_hg_layer: stride-2 residual then (mod-1) residuals at next_dim.
        low = _Residual(next_dim, 2, dtype=self.dtype, name="low1_0")(x, train)
        for i in range(1, curr_mod):
            low = _Residual(next_dim, dtype=self.dtype, name=f"low1_{i}")(low, train)

        if n > 1:
            low = _HourglassModule(n - 1, dtype=self.dtype, name="low2")(low, train)
        else:
            for i in range(next_mod):
                low = _Residual(next_dim, dtype=self.dtype, name=f"low2_{i}")(
                    low, train
                )

        # make_layer_revr: (mod-1) residuals at next_dim, then next→curr.
        for i in range(curr_mod - 1):
            low = _Residual(next_dim, dtype=self.dtype, name=f"low3_{i}")(low, train)
        low = _Residual(curr_dim, dtype=self.dtype,
                        name=f"low3_{curr_mod - 1}")(low, train)

        # nn.Upsample(scale_factor=2), nearest.
        up2 = jnp.repeat(jnp.repeat(low, 2, axis=1), 2, axis=2)
        return up + up2


class HourglassNet(nn.Module):
    """2-stack hourglass; returns the LAST stack's heads (training uses all
    stacks via `return_all_stacks`)."""

    config: CenterPoseConfig
    num_stacks: int = 2
    return_all_stacks: bool = False

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, pre_hm_hp=None, train=False):
        del pre_img, pre_hm, pre_hm_hp
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)

        # Pre: 7x7 s2 conv + residual s2 → stride 4 (large_hourglass.py:209-212).
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
                # make_kp_layer hardwires curr_dim=256 as the head width.
                heads[head] = HeadConv(
                    classes, 256, use_gn=False, bias_init_value=bias0,
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
