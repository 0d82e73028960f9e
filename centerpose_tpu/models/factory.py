"""Model factory: arch string → flax module (parity: src/lib/models/model.py:16-31).

Arch strings follow the reference convention `name_numlayers`:
  dla_34    — DLA-34 + DCN neck, plain heads (released camera/chair models)
  dlav1_34  — DLA-34 + DCN neck + convGRU chained heads (the v1 paper model)
  dlav0_34  — DLA-34 with plain-conv neck (no DCN)
  res_18/34/... — ResNet + deconv simple baseline (centerpose_tpu.models.resnet)
"""

from __future__ import annotations

from flax import linen as nn

from centerpose_tpu.config import CenterPoseConfig
from centerpose_tpu.models.centerpose import CenterPoseNet


def create_model(config: CenterPoseConfig) -> nn.Module:
    arch = config.arch
    name = arch.split("_")[0] if "_" in arch else arch
    if name in ("dla", "dlav1"):
        return CenterPoseNet(config, deformable=True)
    if name == "dlav0":
        from centerpose_tpu.models.centerpose import CenterPoseNetV0

        return CenterPoseNetV0(config)
    if name == "res":
        from centerpose_tpu.models.resnet import PoseResNet

        num_layers = int(arch.split("_")[1])
        return PoseResNet(config, num_layers=num_layers)
    if name == "resdcn":
        from centerpose_tpu.models.resnet import PoseResNet

        num_layers = int(arch.split("_")[1])
        return PoseResNet(config, num_layers=num_layers, deformable_deconv=True)
    if name == "hourglass":
        from centerpose_tpu.models.hourglass import HourglassNet

        return HourglassNet(config)
    raise ValueError(f"unknown arch: {arch!r}")
