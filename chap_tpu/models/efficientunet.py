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
        # TF-SAME padding + BN eps 1e-3: the EfficientNet lineage's exact
        # semantics (the reference loads lukemelas efficientnet_pytorch
        # weights whose convs are Conv2dStaticSamePadding and whose
        # batch_norm_epsilon is 1e-3) — required for pretrained ingestion
        # (chap_tpu.convert.convert_efficientnet_pretrained).
        h = x
        if self.expand_ratio != 1:
            h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype)(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-3, dtype=self.dtype)(h)
            h = nn.swish(h)
        h = nn.Conv(mid, (self.kernel, self.kernel), strides=self.stride,
                    padding="SAME", feature_group_count=mid,
                    use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype)(h)
        h = nn.swish(h)
        h = SqueezeExcite(max(1, int(in_ch * self.se_ratio)), self.dtype)(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype)(h)
        if self.stride == 1 and in_ch == self.out_channels:
            h = h + x
        return h


# (out_channels, num_blocks, stride, kernel, expand) per B0 stage
_B0_STAGES = ((16, 1, 1, 3, 1), (24, 2, 2, 3, 6), (40, 2, 2, 5, 6),
              (80, 3, 2, 3, 6), (112, 3, 1, 5, 6), (192, 4, 2, 5, 6),
              (320, 1, 1, 3, 6))

# compound-scaling (width, depth) coefficients, the multi-arch get_encoder
# table (efficient_encoder.py:124-201 pretrained-settings rows b0..b7)
_SCALING = {
    "efficientnet-b0": (1.0, 1.0), "efficientnet-b1": (1.0, 1.1),
    "efficientnet-b2": (1.1, 1.2), "efficientnet-b3": (1.2, 1.4),
    "efficientnet-b4": (1.4, 1.8), "efficientnet-b5": (1.6, 2.2),
    "efficientnet-b6": (1.8, 2.6), "efficientnet-b7": (2.0, 3.1),
}


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    """EfficientNet channel rounding (efficientnet_pytorch.utils semantics the
    reference's get_model_params resolves to)."""
    filters *= width
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def round_repeats(repeats: int, depth: float) -> int:
    import math
    return int(math.ceil(depth * repeats))


class EfficientNetEncoder(nn.Module):
    """EfficientNet feature pyramid, any b0..b7 via compound scaling:
    returns features after the stem and at each resolution drop
    (b0: channels [32, 24, 40, 112, 320] at strides [2, 4, 8, 16, 32],
    matching efficient_encoder.py:129 out_channels[1:])."""
    width: float = 1.0
    depth: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> List[jnp.ndarray]:
        h = nn.Conv(round_filters(32, self.width), (3, 3), strides=2,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="stem")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype)(h)
        h = nn.swish(h)
        feats = [h]
        for si, (ch, blocks, stride, kernel, expand) in enumerate(_B0_STAGES):
            ch = round_filters(ch, self.width)
            for b in range(round_repeats(blocks, self.depth)):
                h = MBConv(ch, expand, stride if b == 0 else 1, kernel,
                           dtype=self.dtype, name=f"stage{si}_block{b}")(h, train=train)
            if si in (1, 2, 4, 6):  # resolution-drop boundaries
                feats.append(h)
        return feats


def get_encoder(name: str = "efficientnet-b0", dtype=jnp.float32
                ) -> EfficientNetEncoder:
    """get_encoder equivalent (efficient_encoder.py:203-216): encoder by
    name. (ImageNet weights load via
    chap_tpu.convert.convert_efficientnet_pretrained from a local .pth —
    this environment has no network for the reference's url_map downloads.)"""
    if name not in _SCALING:
        raise KeyError(f"unknown encoder {name!r}; have {sorted(_SCALING)}")
    w, d = _SCALING[name]
    return EfficientNetEncoder(width=w, depth=d, dtype=dtype)


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
    """Effi_UNet equivalent (efficientunet.py:143-215); encoder_name selects
    the b0..b7 backbone like the reference's get_encoder."""
    num_classes: int
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    encoder_name: str = "efficientnet-b0"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        w, d = _SCALING[self.encoder_name]
        feats = EfficientNetEncoder(w, d, self.dtype, name="encoder")(
            x, train=train)
        skips = feats[:-1][::-1] + [None]  # deepest first, no skip at last up
        h = feats[-1]
        for i, ch in enumerate(self.decoder_channels):
            h = DecoderBlock(ch, self.dtype, name=f"decoder{i}")(
                h, skips[i], train=train)
        return nn.Conv(self.num_classes, (3, 3), padding=1, dtype=self.dtype,
                       name="segmentation_head")(h)
