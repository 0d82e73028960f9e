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
    used = set()

    def fill(tree, collection, path=()):
        if isinstance(tree, dict):
            return {
                k: fill(v, collection, path + (k,)) for k, v in tree.items()
            }
        tkey, transform = _torch_key_for(path, collection)
        tkey = tkey.replace(".__OUT__.", f".{out_idx}.")
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
        ignorable = re.compile(r"num_batches_tracked$|^fc\.")
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
