"""Efficient-UNet: EfficientNet-style MBConv encoder + UNet decoder
(reference efficientunet.py:27-215 Effi_UNet/UnetDecoder/DecoderBlock over
efficient_encoder.py:70-109 EfficientNetEncoder).

The reference loads torch pretrained EfficientNet weights; this rebuild trains
from scratch (no torch checkpoints on TPU), with an EfficientNet-B0 topology:
stem 32ch, MBConv stages producing the standard 5-level pyramid
[16, 24, 40, 112, 320] at strides 2..32, SE ratio 0.25, swish activations.
"""
from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax.numpy as jnp


class SqueezeExcite(nn.Module):
    reduced: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.swish(nn.Conv(self.reduced, (1, 1), dtype=self.dtype)(s))
        s = nn.sigmoid(nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype)(s))
        return x * s


class MBConv(nn.Module):
    out_channels: int
    expand_ratio: int = 6
    stride: int = 1
    kernel: int = 3
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        in_ch = x.shape[-1]
        mid = in_ch * self.expand_ratio
        h = x
        if self.expand_ratio != 1:
            h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype)(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
            h = nn.swish(h)
        h = nn.Conv(mid, (self.kernel, self.kernel), strides=self.stride,
                    padding=self.kernel // 2, feature_group_count=mid,
                    use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        h = nn.swish(h)
        h = SqueezeExcite(max(1, int(in_ch * self.se_ratio)), self.dtype)(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        if self.stride == 1 and in_ch == self.out_channels:
            h = h + x
        return h


# (out_channels, num_blocks, stride, kernel, expand) per B0 stage
_B0_STAGES = ((16, 1, 1, 3, 1), (24, 2, 2, 3, 6), (40, 2, 2, 5, 6),
              (80, 3, 2, 3, 6), (112, 3, 1, 5, 6), (192, 4, 2, 5, 6),
              (320, 1, 1, 3, 6))


class EfficientNetEncoder(nn.Module):
    """B0 feature pyramid: returns features after stem and at each resolution
    drop: channels [32, 24, 40, 112, 320] at strides [2, 4, 8, 16, 32]."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> List[jnp.ndarray]:
        h = nn.Conv(32, (3, 3), strides=2, padding=1, use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        h = nn.swish(h)
        feats = [h]
        for si, (ch, blocks, stride, kernel, expand) in enumerate(_B0_STAGES):
            for b in range(blocks):
                h = MBConv(ch, expand, stride if b == 0 else 1, kernel,
                           dtype=self.dtype, name=f"stage{si}_block{b}")(h, train=train)
            if si in (1, 2, 4, 6):  # resolution-drop boundaries
                feats.append(h)
        return feats  # [32@1/2, 24@1/4, 40@1/8, 112@1/16, 320@1/32]


class DecoderBlock(nn.Module):
    """2x nearest upsample + skip concat + 2x conv-BN-ReLU
    (efficientunet.py:27-62)."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip, *, train: bool) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        for _ in range(2):
            x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class EffiUNet(nn.Module):
    """Effi_UNet equivalent (efficientunet.py:143-215)."""
    num_classes: int
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        feats = EfficientNetEncoder(self.dtype, name="encoder")(x, train=train)
        skips = feats[:-1][::-1] + [None]  # deepest first, no skip at last up
        h = feats[-1]
        for i, ch in enumerate(self.decoder_channels):
            h = DecoderBlock(ch, self.dtype, name=f"decoder{i}")(
                h, skips[i], train=train)
        return nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype,
                       name="segmentation_head")(h)
