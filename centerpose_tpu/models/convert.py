"""PyTorch checkpoint → flax variables converter.

Parity target: consuming the reference's released `.pth` models
(src/lib/models/model.py:34-87 `load_model`: strips `module.` DataParallel prefixes,
holds {epoch, state_dict, optimizer}). This maps every torch parameter/buffer name of
the reference `DLASeg` (pose_dla_dcn.py) onto the flax tree of
centerpose_tpu.models.CenterPoseNet, with layout transposes:

  conv weight   OIHW → HWIO
  depthwise ConvTranspose2d weight [C, 1, k, k] → [k, k, 1, C] (no flip — the flax
      UpsampleConv flips at apply time, which realizes the transposed conv)
  BatchNorm     weight/bias/running_mean/running_var → scale/bias/mean/var
  DCN offset/mask conv: torch emits [o1(9) | o2(9) | mask(9)] channels and then
      cat(o1, o2) — i.e. channels 0..17 are the interleaved (dy, dx) per tap and
      18..26 the mask logits, exactly the layout dcn_v2 expects (see ops/dcn.py).

The conversion walks OUR tree and derives each torch key, so any unmapped parameter
is a hard error (no silent partial loads; shape mismatches raise).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _t_conv(w) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _t_upconv(w) -> np.ndarray:
    # [C, 1, k, k] -> [k, k, 1, C]
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _t_deconv(w) -> np.ndarray:
    # Full ConvTranspose2d weight [in, out, k, k] -> [k, k, in, out]
    # (TorchConvTranspose flips spatially at apply time).
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 0, 1)))


def strip_module_prefix(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def _torch_key_for(path: Tuple[str, ...], collection: str) -> Tuple[str, Any]:
    """Map a flax tree path to (torch key, transform fn)."""
    parts = list(path)
    leaf = parts.pop()

    bn_map = {"scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"}

    # Stems: base/<stem>/conv/{conv,bn}; torch Sequential idx 0=conv, 1=bn.
    stems = ("base_layer", "pre_img_layer", "pre_hm_layer", "pre_hm_hp_layer")
    if len(parts) >= 4 and parts[0] == "base" and parts[1] in stems:
        stem, sub = parts[1], parts[3]  # sub: 'conv' or 'bn'
        if sub == "conv":
            return f"base.{stem}.0.weight", _t_conv
        return f"base.{stem}.1.{bn_map[leaf]}", np.asarray

    if len(parts) >= 3 and parts[0] == "base" and re.match(r"level[01]$", parts[1]):
        lvl = parts[1]
        i = int(re.match(r"conv(\d+)", parts[2]).group(1))
        sub = parts[3]
        if sub == "conv":
            return f"base.{lvl}.{3 * i}.weight", _t_conv
        return f"base.{lvl}.{3 * i + 1}.{bn_map[leaf]}", np.asarray

    # Trees (level2..5): nested tree1/tree2/root/project + BasicBlock conv1/conv2.
    if len(parts) >= 2 and parts[0] == "base" and re.match(r"level[2-5]$", parts[1]):
        torch_parts = ["base", parts[1]]
        i = 2
        while i < len(parts):
            p = parts[i]
            if p in ("tree1", "tree2"):
                torch_parts.append(p)
            elif p == "project":
                sub = parts[i + 1]
                if sub == "conv":
                    return ".".join(torch_parts) + ".project.0.weight", _t_conv
                return ".".join(torch_parts) + f".project.1.{bn_map[leaf]}", np.asarray
            elif p == "root":
                sub = parts[i + 2]  # root/conv/{conv,bn}
                if sub == "conv":
                    return ".".join(torch_parts) + ".root.conv.weight", _t_conv
                return ".".join(torch_parts) + f".root.bn.{bn_map[leaf]}", np.asarray
            elif p in ("conv1", "conv2"):
                sub = parts[i + 1]
                if sub == "conv":
                    return ".".join(torch_parts) + f".{p}.weight", _t_conv
                return (
                    ".".join(torch_parts) + f".{p.replace('conv', 'bn')}.{bn_map[leaf]}",
                    np.asarray,
                )
            i += 1

    # ---- ResNet family (msra_resnet.py / resnet_dcn.py) ----
    # Stem: stem/{conv,bn} -> conv1.weight / bn1.*
    if parts and parts[0] == "stem":
        if parts[1] == "conv":
            return "conv1.weight", _t_conv
        return f"bn1.{bn_map[leaf]}", np.asarray

    # Residual stages: layer{s}_{b}/{convN|downsample}/{conv,bn}.
    m = re.match(r"layer(\d+)_(\d+)$", parts[0]) if parts else None
    if m:
        s, b = m.group(1), m.group(2)
        comp = parts[1]
        sub = parts[2]
        if comp == "downsample":
            if sub == "conv":
                return f"layer{s}.{b}.downsample.0.weight", _t_conv
            return f"layer{s}.{b}.downsample.1.{bn_map[leaf]}", np.asarray
        n = re.match(r"conv(\d+)", comp).group(1)
        if sub == "conv":
            return f"layer{s}.{b}.conv{n}.weight", _t_conv
        return f"layer{s}.{b}.bn{n}.{bn_map[leaf]}", np.asarray

    # msra deconv stages: deconv{i}/kernel + deconv_bn{i} ->
    # deconv_layers Sequential [convT, BN, ReLU]*3 (indices 3i / 3i+1).
    m = re.match(r"deconv(\d+)$", parts[0]) if parts else None
    if m:
        return f"deconv_layers.{3 * int(m.group(1))}.weight", _t_deconv
    m = re.match(r"deconv_bn(\d+)$", parts[0]) if parts else None
    if m:
        i = int(m.group(1))
        # resdcn packs [DCN, BN, ReLU, convT, BN, ReLU] per stage (6 entries);
        # presence of a sibling deconv_dcn path is signalled by the caller via
        # the __RESDCN__ marker replacement; default to the msra 3-stride.
        return f"deconv_layers.__DBN{i}__.{bn_map[leaf]}", np.asarray

    # resdcn deconv stages: deconv_dcn{i} (DCN+BN), deconv_up{i} (convT).
    m = re.match(r"deconv_dcn(\d+)$", parts[0]) if parts else None
    if m:
        base = f"deconv_layers.{6 * int(m.group(1))}"
        if len(parts) == 1:  # DCN's own weight/bias
            if leaf == "weight":
                return f"{base}.weight", _t_conv
            return f"{base}.bias", np.asarray
        if parts[1] == "conv_offset_mask":
            return (
                f"{base}.conv_offset_mask.{'weight' if leaf == 'kernel' else 'bias'}",
                _t_conv if leaf == "kernel" else np.asarray,
            )
        if parts[1] == "bn":
            return (
                f"deconv_layers.{6 * int(m.group(1)) + 1}.{bn_map[leaf]}",
                np.asarray,
            )
    m = re.match(r"deconv_up(\d+)$", parts[0]) if parts else None
    if m:
        return f"deconv_layers.{6 * int(m.group(1)) + 3}.weight", _t_deconv

    # ---- Hourglass (large_hourglass.py exkp) ----
    def _residual_key(base: str, comp: str, sub: str) -> Tuple[str, Any]:
        # CornerNet residual attrs: conv1/bn1, conv2/bn2, skip.0/skip.1.
        if comp == "skip":
            if sub == "conv":
                return f"{base}.skip.0.weight", _t_conv
            return f"{base}.skip.1.{bn_map[leaf]}", np.asarray
        n = comp[-1]
        if sub == "conv":
            return f"{base}.conv{n}.weight", _t_conv
        return f"{base}.bn{n}.{bn_map[leaf]}", np.asarray

    if parts and parts[0] == "pre_conv":
        if parts[1] == "conv":
            return "pre.0.conv.weight", _t_conv
        return f"pre.0.bn.{bn_map[leaf]}", np.asarray
    if parts and parts[0] == "pre_res":
        return _residual_key("pre.1", parts[1], parts[2])
    m = re.match(r"hg_(\d+)$", parts[0]) if parts else None
    if m:
        toks = ["kps", m.group(1)]
        i = 1
        while i < len(parts) - 2:
            t = parts[i]
            mm = re.match(r"(up1|low1|low2|low3)_(\d+)$", t)
            if mm:
                toks += [mm.group(1), mm.group(2)]
            else:  # nested 'low2' kp_module
                toks.append(t)
            i += 1
        return _residual_key(".".join(toks), parts[-2], parts[-1])
    m = re.match(r"feat_(\d+)$", parts[0]) if parts else None
    if m:
        if parts[1] == "conv":
            return f"cnvs.{m.group(1)}.conv.weight", _t_conv
        return f"cnvs.{m.group(1)}.bn.{bn_map[leaf]}", np.asarray
    m = re.match(r"inter_(a|b)_(\d+)$", parts[0]) if parts else None
    if m:
        seq = "inters_" if m.group(1) == "a" else "cnvs_"
        if parts[1] == "conv":
            return f"{seq}.{m.group(2)}.0.weight", _t_conv
        return f"{seq}.{m.group(2)}.1.{bn_map[leaf]}", np.asarray
    m = re.match(r"inter_res_(\d+)$", parts[0]) if parts else None
    if m:
        return _residual_key(f"inters.{m.group(1)}", parts[1], parts[2])
    # Per-stack heads {head}_{s}: ModuleList of make_kp_layer Sequentials
    # [convolution(with_bn=False) -> 1x1 conv].
    m = re.match(r"(.+)_(\d+)$", parts[0]) if parts else None
    if m and len(parts) >= 2 and parts[1] in ("conv1", "out"):
        head, s = m.group(1), m.group(2)
        if parts[1] == "conv1":
            return f"{head}.{s}.0.conv.{'weight' if leaf == 'kernel' else 'bias'}", (
                _t_conv if leaf == "kernel" else np.asarray
            )
        return f"{head}.{s}.1.{'weight' if leaf == 'kernel' else 'bias'}", (
            _t_conv if leaf == "kernel" else np.asarray
        )

    # ---- dlav0 neck (dlav0.py IDAUp/DLAUp): dla_up/ida_i/{proj,up,node}_j ----
    if (
        parts
        and parts[0] == "dla_up"
        and len(parts) >= 2
        and re.match(r"(proj|up|node)_\d+$", parts[2] if len(parts) > 2 else "")
    ):
        base = f"dla_up.{parts[1]}.{parts[2]}"
        comp = parts[2].split("_")[0]
        if comp == "up":
            return f"{base}.weight", _t_upconv
        # proj/node are Sequential(Conv2d(bias=False), BN, ReLU).
        sub = parts[3]  # 'conv' | 'bn' (inside ConvBN)
        if sub == "conv":
            return f"{base}.0.weight", _t_conv
        return f"{base}.1.{bn_map[leaf]}", np.asarray

    # DLAUp / IDAUp stages: {dla_up/ida_k|ida_up}/stage_i/{proj,up,node}.
    if parts[0] in ("dla_up", "ida_up"):
        if parts[0] == "dla_up":
            base = f"dla_up.{parts[1]}"
            stage = parts[2]
            rest = parts[3:]
        else:
            base = "ida_up"
            stage = parts[1]
            rest = parts[2:]
        idx = stage.split("_")[1]
        comp = rest[0]  # proj | up | node
        if comp == "up":
            return f"{base}.up_{idx}.weight", _t_upconv
        tkey = f"{base}.{comp}_{idx}"
        if len(rest) == 1:  # DCN's own weight/bias leaf
            if leaf == "weight":
                return f"{tkey}.conv.weight", _t_conv
            return f"{tkey}.conv.bias", np.asarray
        sub = rest[1]
        if sub == "conv_offset_mask":
            return (
                f"{tkey}.conv.conv_offset_mask.{'weight' if leaf == 'kernel' else 'bias'}",
                _t_conv if leaf == "kernel" else np.asarray,
            )
        if sub == "bn":
            return f"{tkey}.actf.0.{bn_map[leaf]}", np.asarray
        if sub == "conv":  # dlav0-style plain ConvBN proj/node
            inner = rest[2]
            if inner == "conv":
                return f"{tkey}.0.weight", _t_conv
            return f"{tkey}.1.{bn_map[leaf]}", np.asarray

    # ConvGRU cells.
    if parts[0] == "convGRU":
        gate = parts[2]  # Wir/Whr/...
        tleaf = "weight" if leaf == "kernel" else "bias"
        return f"convGRU.{parts[1]}.{gate}.{tleaf}", (
            _t_conv if leaf == "kernel" else np.asarray
        )

    # Heads: <head>/{conv1,gn,out}; torch Sequential [conv, (GN), ReLU, conv].
    if len(parts) >= 2 and parts[1] in ("conv1", "gn", "out"):
        head = parts[0]
        sub = parts[1]
        has_gn = sub == "gn" or None  # resolved by caller via use_gn flag
        if sub == "conv1":
            return f"{head}.0.{'weight' if leaf == 'kernel' else 'bias'}", (
                _t_conv if leaf == "kernel" else np.asarray
            )
        if sub == "gn":
            return f"{head}.1.{'weight' if leaf == 'scale' else 'bias'}", np.asarray
        # 'out': index 3 with GN, 2 without — caller patches via _HEAD_OUT_IDX.
        return f"{head}.__OUT__.{'weight' if leaf == 'kernel' else 'bias'}", (
            _t_conv if leaf == "kernel" else np.asarray
        )

    raise KeyError(f"no torch mapping for flax path {'/'.join(path)}/{leaf} [{collection}]")


def convert_state_dict(
    state_dict: Mapping[str, Any],
    flax_variables: Dict[str, Any],
    use_gn: bool,
    strict: bool = True,
) -> Dict[str, Any]:
    """Fill a flax variables dict (params + batch_stats) from a torch state_dict.

    Args:
      state_dict: torch name → tensor/ndarray (DataParallel prefixes allowed).
      flax_variables: template from model.init (shapes/structure).
      use_gn: whether heads contain GroupNorm (convGRU models) — decides the
              output-conv Sequential index (3 vs 2).
    """
    sd = strip_module_prefix(state_dict)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    out_idx = "3" if use_gn else "2"
    # resdcn's deconv Sequential has 6 entries/stage (DCN,BN,ReLU,convT,BN,ReLU)
    # vs msra's 3 (convT,BN,ReLU) — resolves the deconv_bn{i} index.
    is_resdcn = "deconv_dcn0" in flax_variables.get("params", {})
    used = set()

    def fill(tree, collection, path=()):
        if isinstance(tree, dict):
            return {
                k: fill(v, collection, path + (k,)) for k, v in tree.items()
            }
        tkey, transform = _torch_key_for(path, collection)
        tkey = tkey.replace(".__OUT__.", f".{out_idx}.")
        m = re.search(r"__DBN(\d+)__", tkey)
        if m:
            i = int(m.group(1))
            tkey = tkey.replace(
                f"__DBN{i}__", str(6 * i + 4 if is_resdcn else 3 * i + 1)
            )
        if tkey not in sd:
            if strict:
                raise KeyError(f"torch key {tkey!r} (for {'/'.join(path)}) not found")
            return tree
        used.add(tkey)
        val = transform(sd[tkey])
        if val.shape != tree.shape:
            raise ValueError(
                f"shape mismatch for {tkey}: torch {val.shape} vs flax {tree.shape}"
            )
        return val.astype(np.asarray(tree).dtype)

    converted = {
        "params": fill(flax_variables["params"], "params"),
    }
    if "batch_stats" in flax_variables:
        converted["batch_stats"] = fill(flax_variables["batch_stats"], "batch_stats")

    if strict:
        # dlav0's trunk keeps its ImageNet classification head (base.fc) in the
        # state_dict; CenterPose never runs it.
        ignorable = re.compile(r"num_batches_tracked$|^fc\.|\.fc\.")
        leftover = [k for k in sd if k not in used and not ignorable.search(k)]
        if leftover:
            raise KeyError(f"unconsumed torch keys: {leftover[:10]} (+{len(leftover)-10 if len(leftover)>10 else 0})")
    return converted


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """Read a reference checkpoint file {epoch, state_dict, ...} via torch-cpu."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
