"""Test-only bridge to the reference PyTorch implementation.

The reference tree (/root/reference/src/lib, read-only) is imported as a
random-weight parity ORACLE: build the torch model, randomize its weights,
convert the state_dict through centerpose_tpu.models.convert, and assert
forward agreement. No reference code is copied — it is exercised in place.

The CUDA DCNv2 extension obviously cannot load here; a stub module exposing
the same `DCN` interface (same parameter names/shapes, same offset/mask
chunking as DCNv2/dcn_v2.py:97-128) is bound to the repo's independent C++
CPU oracle (native/dcn_cpu.cpp) before `pose_dla_dcn` is imported.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REF_LIB = "/root/reference/src/lib"


def _ensure_ref_path():
    # networks/convGRU.py imports `lib.models.data_parallel`, so the parent
    # `src` dir must be importable as the `lib` package root as well.
    for p in (REF_LIB, REF_LIB[: -len("/lib")]):
        if p not in sys.path:
            sys.path.insert(0, p)


def install_dcn_stub():
    """Register models.networks.DCNv2.dcn_v2 backed by the C++ CPU oracle."""
    name = "models.networks.DCNv2.dcn_v2"
    if name in sys.modules:
        return sys.modules[name].DCN

    import torch
    import torch.nn as nn

    from centerpose_tpu.native import dcn_forward_native

    class DCN(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size,
                     stride=1, padding=1, dilation=1, deformable_groups=1):
            super().__init__()
            if isinstance(kernel_size, int):
                kernel_size = (kernel_size, kernel_size)
            self.in_channels = in_channels
            self.out_channels = out_channels
            self.kernel_size = kernel_size
            self.stride = stride if isinstance(stride, int) else stride[0]
            self.padding = padding
            self.dilation = dilation
            self.deformable_groups = deformable_groups
            self.weight = nn.Parameter(
                torch.empty(out_channels, in_channels, *kernel_size)
            )
            self.bias = nn.Parameter(torch.zeros(out_channels))
            stdv = 1.0 / (in_channels * kernel_size[0] * kernel_size[1]) ** 0.5
            self.weight.data.uniform_(-stdv, stdv)
            ch = deformable_groups * 3 * kernel_size[0] * kernel_size[1]
            self.conv_offset_mask = nn.Conv2d(
                in_channels, ch, kernel_size=kernel_size, stride=self.stride,
                padding=padding, bias=True,
            )
            self.conv_offset_mask.weight.data.zero_()
            self.conv_offset_mask.bias.data.zero_()

        def forward(self, x):
            out = self.conv_offset_mask(x)
            o1, o2, mask = torch.chunk(out, 3, dim=1)
            offset = torch.cat((o1, o2), dim=1)
            mask = torch.sigmoid(mask)
            y = dcn_forward_native(
                x.detach().numpy().transpose(0, 2, 3, 1),
                offset.detach().numpy().transpose(0, 2, 3, 1),
                mask.detach().numpy().transpose(0, 2, 3, 1),
                self.weight.detach().numpy().transpose(2, 3, 1, 0),
                self.bias.detach().numpy(),
                stride=self.stride, pad=self.padding, dilation=self.dilation,
            )
            if y is None:
                raise RuntimeError("native dcn oracle unavailable (no g++?)")
            return torch.from_numpy(np.ascontiguousarray(y.transpose(0, 3, 1, 2)))

    pkg = types.ModuleType("models.networks.DCNv2")
    pkg.__path__ = []  # mark as package
    mod = types.ModuleType(name)
    mod.DCN = DCN
    mod.DCNv2 = DCN
    pkg.dcn_v2 = mod
    sys.modules["models.networks.DCNv2"] = pkg
    sys.modules[name] = mod
    return DCN


def build_ref_model(arch: str, heads: dict, head_conv: int, tracking: bool = False):
    """Construct the reference torch model for `arch` with random-but-sane
    weights (torch's own init) in eval mode."""
    _ensure_ref_path()
    import torch

    torch.manual_seed(0)
    if arch.startswith("dlav0"):
        from models.networks import dlav0

        # Upstream breakage: get_pose_net passes an `opt` kwarg DLASeg rejects,
        # and DLA.__init__ dereferences opt.pre_img with opt=None. Inject a
        # default opt through the dla34 factory and build DLASeg directly.
        no_stems = types.SimpleNamespace(pre_img=False, pre_hm=False, pre_hm_hp=False)
        orig_dla34 = dlav0.dla34

        def dla34_with_opt(pretrained=False, **kw):
            kw.setdefault("opt", no_stems)
            return orig_dla34(pretrained, **kw)

        dlav0.dla34 = dla34_with_opt  # DLASeg resolves base via globals()
        try:
            model = dlav0.DLASeg(
                "dla34", heads, pretrained=False, down_ratio=4,
                head_conv=head_conv,
            )
        finally:
            dlav0.dla34 = orig_dla34
    elif arch.startswith("resdcn"):
        install_dcn_stub()
        from models.networks import resnet_dcn

        num_layers = int(arch.split("_")[1])
        block, layers = resnet_dcn.resnet_spec[num_layers]
        # Build PoseResNet directly: get_pose_net→init_weights downloads
        # pretrained weights from model_zoo (no egress here); randomize_state
        # supplies the weights instead.
        model = resnet_dcn.PoseResNet(block, layers, heads, head_conv)
    elif arch.startswith("res"):
        from models.networks import msra_resnet

        num_layers = int(arch.split("_")[1])
        opt = types.SimpleNamespace(pre_img=False, pre_hm=False, pre_hm_hp=False)
        block, layers = msra_resnet.resnet_spec[num_layers]
        model = msra_resnet.PoseResNet(block, layers, heads, head_conv, opt)
    elif arch.startswith("hourglass"):
        from models.networks import large_hourglass

        model = large_hourglass.get_large_hourglass_net(0, heads, head_conv)
    elif arch.startswith("dla"):
        install_dcn_stub()
        from models.networks import pose_dla_dcn

        opt = types.SimpleNamespace(
            tracking_task=tracking, pre_img=tracking, pre_hm=tracking,
            pre_hm_hp=tracking,
        )
        model = pose_dla_dcn.DLASeg(
            "dla34", heads, pretrained=False, down_ratio=4, final_kernel=1,
            last_level=5, head_conv=head_conv,
            use_convGRU=arch.startswith("dlav1"), opt=opt,
        )
    else:
        raise ValueError(arch)
    model.eval()
    return model


def randomize_state(model, seed: int = 0, offset_noise: float = 0.0):
    """Randomize BatchNorm running stats / affine params in-place (conv weights
    keep torch's own random init, which has sane magnitudes), and optionally
    perturb zero-init DCN offset convs so the deformable sampling is exercised
    at non-trivial offsets."""
    import torch

    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if not isinstance(v, torch.Tensor) or v.dtype not in (torch.float32, torch.float64):
            continue
        if k.endswith("running_mean"):
            v.copy_(torch.randn(v.shape, generator=g) * 0.05)
        elif k.endswith("running_var"):
            v.copy_(torch.rand(v.shape, generator=g) * 1.0 + 0.5)
        elif ".bn" in k or "_bn" in k or "bn1" in k or "bn2" in k or "bn3" in k:
            if k.endswith("weight"):
                v.copy_(torch.rand(v.shape, generator=g) + 0.5)
            elif k.endswith("bias"):
                v.copy_(torch.randn(v.shape, generator=g) * 0.05)
        if offset_noise and "conv_offset_mask" in k:
            v.add_(torch.randn(v.shape, generator=g) * offset_noise)


def torch_forward(model, x_nchw: np.ndarray) -> dict:
    import torch

    with torch.no_grad():
        outs = model(torch.from_numpy(x_nchw))
    out = outs[-1] if isinstance(outs, (list, tuple)) else outs
    return {k: v.numpy() for k, v in out.items()}


def torch_forward_extra(model, x_nchw: np.ndarray, extra: dict) -> dict:
    """Forward with the tracking early-fusion inputs (NCHW numpy): DLASeg's
    pre_img/pre_hm/pre_hm_hp kwargs (pose_dla_dcn.py:523-526)."""
    import torch

    with torch.no_grad():
        outs = model(
            torch.from_numpy(x_nchw),
            **{k: torch.from_numpy(v) for k, v in extra.items()},
        )
    out = outs[-1] if isinstance(outs, (list, tuple)) else outs
    return {k: v.numpy() for k, v in out.items()}
