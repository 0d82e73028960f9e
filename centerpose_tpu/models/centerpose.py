"""The full CenterPose network: DLA trunk → DLAUp/IDAUp neck → (convGRU) → heads.

Parity target: `DLASeg` (pose_dla_dcn.py:457-570) with `down_ratio=4`,
`last_level=5`, `final_kernel=1`. Head routing with convGRU (:542-565):

  image model (3 GRU steps):    step0 → {hm, wh, reg}
                                step1 → {hm_hp, hp_offset, hps, hps_uncertainty}
                                step2 → {scale, scale_uncertainty}
  tracking model (4 GRU steps): step0 → {tracking, tracking_hp}, then shifted.

Without convGRU every head reads the final stride-4 feature directly (:567-570).
Output is a dict of NHWC maps at stride 4.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from centerpose_tpu.config import CenterPoseConfig
from centerpose_tpu.models.conv_gru import ConvGRU
from centerpose_tpu.models.dla import DLA, DLA34_CHANNELS, DLAUp, DLAUpV0, IDAUp
from centerpose_tpu.models.layers import HeadConv, SplitHeadConv

FIRST_LEVEL = 2  # log2(down_ratio=4)
LAST_LEVEL = 5

# GRU-step routing (pose_dla_dcn.py:542-565).
_GRU_GROUPS_IMAGE = (
    ("hm", "wh", "reg"),
    ("hm_hp", "hp_offset", "hps", "hps_uncertainty"),
    ("scale", "scale_uncertainty"),
)
_GRU_GROUPS_TRACK = (
    ("tracking", "tracking_hp"),
    ("hm", "wh", "reg"),
    ("hm_hp", "hp_offset", "hps", "hps_uncertainty"),
    ("scale", "scale_uncertainty"),
)


class CenterPoseNetV0(nn.Module):
    """dlav0_34: DLA-34 trunk + the plain-conv concat-node neck (dlav0.py DLASeg,
    :565-660): a single DLAUpV0 aggregate at stride 4 feeds the heads directly —
    no second IDAUp pass, no convGRU, no GroupNorm, no tracking stems."""

    config: CenterPoseConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pre_img=None,
        pre_hm=None,
        pre_hm_hp=None,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        del pre_img, pre_hm, pre_hm_hp  # dlav0 DLASeg never builds the stems
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        channels = DLA34_CHANNELS

        levels = DLA(
            remat_stem=cfg.remat_stem, s2d_stem=cfg.s2d_stem, dtype=dtype,
            name="base",
        )(x, train=train)
        feat = DLAUpV0(channels[FIRST_LEVEL:], dtype=dtype, name="dla_up")(
            levels[FIRST_LEVEL:], train=train
        )
        out: Dict[str, jnp.ndarray] = {}
        for head, classes in cfg.heads.items():
            bias0 = -2.19 if "hm" in head else 0.0
            out[head] = HeadConv(
                classes, cfg.head_conv, use_gn=False, bias_init_value=bias0,
                dtype=dtype, name=head,
            )(feat)
        return out


class CenterPoseNet(nn.Module):
    """dla_34 / dlav1_34 CenterPose model."""

    config: CenterPoseConfig
    deformable: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pre_img: Optional[jnp.ndarray] = None,
        pre_hm: Optional[jnp.ndarray] = None,
        pre_hm_hp: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        channels = DLA34_CHANNELS

        levels = DLA(
            with_pre_img=cfg.tracking_task,
            with_pre_hm=cfg.tracking_task,
            with_pre_hm_hp=cfg.tracking_task,
            remat_stem=cfg.remat_stem,
            s2d_stem=cfg.s2d_stem,
            dtype=dtype,
            name="base",
        )(x, pre_img, pre_hm, pre_hm_hp, train=train)

        pyramid = DLAUp(
            channels[FIRST_LEVEL:],
            deformable=self.deformable,
            dtype=dtype,
            dcn_impl=cfg.dcn_impl,
            dcn_window_radius=cfg.dcn_window_radius,
            dcn_remat=cfg.remat_dcn,
            dcn_bwd=cfg.dcn_bwd,
            name="dla_up",
        )(levels[FIRST_LEVEL:], train=train)

        feat = IDAUp(
            channels[FIRST_LEVEL],
            [2 ** i for i in range(LAST_LEVEL - FIRST_LEVEL)],
            deformable=self.deformable,
            dtype=dtype,
            dcn_impl=cfg.dcn_impl,
            dcn_window_radius=cfg.dcn_window_radius,
            dcn_remat=cfg.remat_dcn,
            dcn_bwd=cfg.dcn_bwd,
            name="ida_up",
        )(pyramid[: LAST_LEVEL - FIRST_LEVEL], train=train)[-1]

        heads = cfg.heads
        use_gru = cfg.use_conv_gru

        def run_head(name: str, feature: jnp.ndarray) -> jnp.ndarray:
            bias0 = -2.19 if "hm" in name else 0.0  # focal-loss prior init
            return HeadConv(
                heads[name],
                cfg.head_conv,
                use_gn=use_gru,
                bias_init_value=bias0,
                dtype=dtype,
                name=name,
            )(feature)

        out: Dict[str, jnp.ndarray] = {}
        if use_gru and cfg.head_conv > 0:
            groups = _GRU_GROUPS_TRACK if cfg.tracking_task else _GRU_GROUPS_IMAGE
            states = ConvGRU(steps=cfg.gru_steps, hidden=64, dtype=dtype, name="convGRU")(
                feat
            )
            # Per GRU step, the present heads' 3x3 conv1 kernels concatenate
            # into ONE wide conv over the shared state (a lone 256-lane conv
            # leaves scheduling/read overlap on the table; the state is read
            # once instead of per head). Identical math + parameter tree
            # (layers.SplitHeadConv).
            mods = {
                head: SplitHeadConv(
                    heads[head],
                    cfg.head_conv,
                    use_gn=True,
                    bias_init_value=-2.19 if "hm" in head else 0.0,
                    dtype=dtype,
                    name=head,
                )
                for head in heads
            }
            for step, group in enumerate(groups):
                present = [h for h in group if h in heads]
                if not present:
                    continue
                feature = states[step]
                ks, bs = zip(
                    *[mods[h].conv1_params(feature.shape[-1]) for h in present]
                )
                wcat = jnp.concatenate(ks, axis=-1).astype(dtype)
                bcat = jnp.concatenate(bs, axis=-1).astype(dtype)
                y = jax.lax.conv_general_dilated(
                    feature.astype(dtype), wcat, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + bcat
                for i, h in enumerate(present):
                    sl = y[..., i * cfg.head_conv:(i + 1) * cfg.head_conv]
                    out[h] = mods[h](sl)
        elif use_gru:
            groups = _GRU_GROUPS_TRACK if cfg.tracking_task else _GRU_GROUPS_IMAGE
            states = ConvGRU(steps=cfg.gru_steps, hidden=64, dtype=dtype, name="convGRU")(
                feat
            )
            for step, group in enumerate(groups):
                for head in group:
                    if head in heads:
                        out[head] = run_head(head, states[step])
        else:
            for head in heads:
                out[head] = run_head(head, feat)
        return out
