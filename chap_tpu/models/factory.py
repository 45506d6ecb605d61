"""Model factories mirroring the reference's net_factory / net_factory_3d
(net_factory.py:11-24, net_factory_3d.py:7-31), returning Flax modules.

Unlike the reference (which silently returns None for unknown names and is
missing its own 'acalnet' default), unknown names raise, and 'acalnet' maps to
the shared-encoder DualDecoder whose encode/decode method surface the ACAL
trainer drives (reconstructed from train_share_encoder_2D.py:183-222,358-364).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from chap_tpu.config import ModelConfig
from chap_tpu.models.unet2d import (
    DualDecoder,
    UNet,
    UNetCCT,
    UNetPlus,
    UNetURPC,
)
from chap_tpu.models.unet3d import UNet3D
from chap_tpu.models.vnet3d import DualDecoder3d, VNet, VNetDS
from chap_tpu.models.attention3d import AttentionUNet3D
from chap_tpu.models.voxresnet import VoxResNet


def _dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def net_factory(net_type: str, in_chns: int, class_num: int,
                cfg: ModelConfig | None = None) -> nn.Module:
    """2D factory: unet | unetp | dualdecoder | acalnet | unet_cct | unet_urpc."""
    cfg = cfg or ModelConfig()
    dtype = _dtype(cfg)
    common = dict(feature_chns=tuple(cfg.feature_chns), dropout=tuple(cfg.dropout), dtype=dtype)
    del in_chns  # input channels are inferred from the input array by Flax
    if net_type == "unet":
        return UNet(num_classes=class_num, **common)
    if net_type == "unetp":
        return UNetPlus(num_classes=class_num, **common)
    if net_type in ("dualdecoder", "acalnet"):
        return DualDecoder(num_classes=class_num, decoder_type=cfg.decoder_type, **common)
    if net_type == "unet_cct":
        return UNetCCT(num_classes=class_num, **common)
    if net_type == "unet_urpc":
        return UNetURPC(num_classes=class_num, **common)
    if net_type == "resunet":
        from chap_tpu.models.resunet2d import ResUNet2d
        return ResUNet2d(num_classes=class_num, dtype=dtype)
    if net_type == "dual_student":
        from chap_tpu.models.dsnet import DSNet
        return DSNet(num_classes=class_num, dtype=dtype)
    if net_type == "swinunet":
        from chap_tpu.models.swin_unet import SwinUNet
        return SwinUNet(num_classes=class_num, img_size=224, dtype=dtype)
    if net_type == "enet":
        from chap_tpu.models.enet import ENet
        return ENet(num_classes=class_num, dtype=dtype)
    if net_type == "pnet":
        from chap_tpu.models.pnet import PNet2D
        return PNet2D(num_classes=class_num, dtype=dtype)
    if net_type == "efficient_unet":
        from chap_tpu.models.efficientunet import EffiUNet
        return EffiUNet(num_classes=class_num, dtype=dtype)
    raise ValueError(f"unknown 2D net_type {net_type!r}")


def net_factory_3d(net_type: str, in_chns: int, class_num: int,
                   mode: str = "train", cfg: ModelConfig | None = None) -> nn.Module:
    """3D factory: unet_3D | vnet | dualdecoder (train/test dropout switch,
    net_factory_3d.py:16-27)."""
    cfg = cfg or ModelConfig()
    dtype = _dtype(cfg)
    has_dropout = mode == "train"
    del in_chns
    if net_type == "unet_3D":
        return UNet3D(num_classes=class_num, dtype=dtype)
    if net_type == "attention_unet":
        return AttentionUNet3D(num_classes=class_num, dtype=dtype)
    if net_type == "voxresnet":
        return VoxResNet(num_classes=class_num, feature_chns=64, dtype=dtype)
    if net_type == "vnet":
        return VNet(num_classes=class_num, n_filters=cfg.n_filters_3d,
                    normalization=cfg.normalization_3d, has_dropout=has_dropout,
                    dtype=dtype, s2d_stem=getattr(cfg, "s2d_stem", True),
                    s2d_stage2=getattr(cfg, "s2d_stage2", False),
                    zpack_stage2=getattr(cfg, "zpack_stage2", False))
    if net_type == "vnet_ds":
        # deep-supervised VNet (vnet.py Decoder_ds:241-300 + SideConv:317-336)
        return VNetDS(num_classes=class_num, n_filters=cfg.n_filters_3d,
                      normalization=cfg.normalization_3d, has_dropout=has_dropout,
                      dtype=dtype, s2d_stem=getattr(cfg, "s2d_stem", True),
                      s2d_stage2=getattr(cfg, "s2d_stage2", False),
                      zpack_stage2=getattr(cfg, "zpack_stage2", False))
    if net_type == "dualdecoder":
        return DualDecoder3d(num_classes=class_num, n_filters=cfg.n_filters_3d,
                             normalization=cfg.normalization_3d,
                             has_dropout=has_dropout, dtype=dtype,
                             s2d_stem=getattr(cfg, "s2d_stem", True),
                             s2d_stage2=getattr(cfg, "s2d_stage2", False),
                             zpack_stage2=getattr(cfg, "zpack_stage2", False))
    if net_type == "resvnet":
        from chap_tpu.models.resvnet import ResVNet
        return ResVNet(num_classes=class_num, has_dropout=has_dropout, dtype=dtype)
    if net_type == "unet_3D_dv_semi":
        from chap_tpu.models.unet3d_dv import UNet3DDvSemi
        return UNet3DDvSemi(num_classes=class_num, dtype=dtype)
    raise ValueError(f"unknown 3D net_type {net_type!r}")
