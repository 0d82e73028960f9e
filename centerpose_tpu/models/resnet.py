"""ResNet + deconv backbone family (res_18/34/50/101/152).

Parity target: the MSRA "simple baseline" backbone
(src/lib/models/networks/msra_resnet.py:108-312): torchvision-style ResNet trunk,
three 4x4-stride-2 deconv stages (256/256/256 channels, BN+ReLU), then per-head
convs. `resdcn_XX` (resnet_dcn.py:134-294) replaces the deconv projections with DCN
— selectable via `deformable_deconv`.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from centerpose_tpu.config import CenterPoseConfig
from centerpose_tpu.models.layers import (
    ConvBN,
    DeformConvBlock,
    HeadConv,
    TorchConvTranspose,
)

# (block type, per-stage block counts) per depth; 'basic' expansion 1, 'bottleneck' 4.
RESNET_SPEC = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class _ResBasic(nn.Module):
    features: int
    stride: int = 1
    project: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        out = ConvBN(self.features, 3, self.stride, relu=True, dtype=self.dtype,
                     name="conv1")(x, train)
        out = ConvBN(self.features, 3, 1, relu=False, dtype=self.dtype,
                     name="conv2")(out, train)
        if self.project:
            residual = ConvBN(self.features, 1, self.stride, relu=False,
                              dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + residual)


class _ResBottleneck(nn.Module):
    features: int  # output features (4x the inner width)
    stride: int = 1
    project: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        inner = self.features // 4
        residual = x
        out = ConvBN(inner, 1, 1, relu=True, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBN(inner, 3, self.stride, relu=True, dtype=self.dtype,
                     name="conv2")(out, train)
        out = ConvBN(self.features, 1, 1, relu=False, dtype=self.dtype,
                     name="conv3")(out, train)
        if self.project:
            residual = ConvBN(self.features, 1, self.stride, relu=False,
                              dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + residual)


class PoseResNet(nn.Module):
    config: CenterPoseConfig
    num_layers: int = 18
    deformable_deconv: bool = False  # resdcn variant

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, pre_hm_hp=None, train=False):
        del pre_img, pre_hm, pre_hm_hp  # tracking stems are a DLA feature
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        kind, counts = RESNET_SPEC[self.num_layers]
        block = _ResBasic if kind == "basic" else _ResBottleneck
        expansion = 1 if kind == "basic" else 4

        x = ConvBN(64, 7, 2, relu=True, dtype=dtype, name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        widths = (64, 128, 256, 512)
        for si, (wd, n_blocks) in enumerate(zip(widths, counts)):
            feats = wd * expansion
            for bi in range(n_blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                project = bi == 0 and (stride != 1 or x.shape[-1] != feats)
                x = block(
                    feats, stride, project, dtype=dtype, name=f"layer{si + 1}_{bi}"
                )(x, train)

        # Three deconv stages back to stride 4.
        if self.deformable_deconv:
            # resdcn (resnet_dcn.py:218-247): per stage DCN(3x3)+BN+ReLU, then a
            # full bilinear-init ConvTranspose2d(4, s2, p1)+BN+ReLU; filters
            # shrink 256→128→64.
            for di, planes in enumerate((256, 128, 64)):
                x = DeformConvBlock(
                    planes, dtype=dtype, dcn_impl=cfg.dcn_impl,
                    dcn_remat=cfg.remat_dcn, name=f"deconv_dcn{di}",
                )(x, train)
                x = TorchConvTranspose(
                    planes, 4, 2, 1, bilinear_init=True, dtype=dtype,
                    name=f"deconv_up{di}",
                )(x)
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=dtype, name=f"deconv_bn{di}",
                )(x)
                x = nn.relu(x)
        else:
            # msra (msra_resnet.py:207-235): full ConvTranspose2d(inplanes→256,
            # 4, s2, p1, bias=False)+BN+ReLU per stage.
            for di in range(3):
                x = TorchConvTranspose(256, 4, 2, 1, dtype=dtype,
                                       name=f"deconv{di}")(x)
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=dtype, name=f"deconv_bn{di}",
                )(x)
                x = nn.relu(x)

        out: Dict[str, jnp.ndarray] = {}
        for head, classes in cfg.heads.items():
            bias0 = -2.19 if "hm" in head else 0.0
            out[head] = HeadConv(
                classes, cfg.head_conv, use_gn=False, bias_init_value=bias0,
                dtype=dtype, name=head,
            )(x)
        return out
