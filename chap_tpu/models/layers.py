"""Shared Flax building blocks for the 2D UNet family.

TPU-native counterparts of the reference's torch blocks (unet.py:44-123):
NHWC layout (XLA's native conv layout on TPU), BatchNorm with mutable
``batch_stats``, LeakyReLU, and exact align_corners=True bilinear upsampling.
Conv + BN + LeakyReLU chains are written back-to-back so XLA fuses the
normalization/activation into the convolution epilogue.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """Exact torch nn.Upsample(scale_factor=2, mode='bilinear',
    align_corners=True) on NHWC input.

    align_corners=True maps output coord o to input coord o*(in-1)/(out-1),
    which is scale_and_translate with scale=(out-1)/(in-1) and
    translation=0.5*(1-scale) per spatial dim.
    """
    n, h, w, c = x.shape
    oh, ow = 2 * h, 2 * w
    scale_h = (oh - 1) / (h - 1) if h > 1 else 2.0
    scale_w = (ow - 1) / (w - 1) if w > 1 else 2.0
    return jax.image.scale_and_translate(
        x,
        shape=(n, oh, ow, c),
        spatial_dims=(1, 2),
        scale=jnp.array([scale_h, scale_w], dtype=x.dtype),
        translation=jnp.array([0.5 * (1 - scale_h), 0.5 * (1 - scale_w)], dtype=x.dtype),
        method="linear",
    )


def upsample2x_trilinear(x: jnp.ndarray) -> jnp.ndarray:
    """align_corners=True trilinear 2x upsample on NDHWC input (vnet.py:105)."""
    n, d, h, w, c = x.shape
    out = (2 * d, 2 * h, 2 * w)
    scales = [(o - 1) / (i - 1) if i > 1 else 2.0 for o, i in zip(out, (d, h, w))]
    return jax.image.scale_and_translate(
        x,
        shape=(n,) + out + (c,),
        spatial_dims=(1, 2, 3),
        scale=jnp.array(scales, dtype=x.dtype),
        translation=jnp.array([0.5 * (1 - s) for s in scales], dtype=x.dtype),
        method="linear",
    )


def upsample2x_nearest(x: jnp.ndarray, spatial_dims: Sequence[int]) -> jnp.ndarray:
    for d in spatial_dims:
        x = jnp.repeat(x, 2, axis=d)
    return x


class ConvBlock(nn.Module):
    """conv3x3-BN-LeakyReLU-dropout-conv3x3-BN-LeakyReLU (unet.py:44-60)."""
    out_channels: int
    dropout_p: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        if self.dropout_p > 0:
            x = nn.Dropout(rate=self.dropout_p, deterministic=not train)(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        return x


class DownBlock(nn.Module):
    """maxpool2x2 then ConvBlock (unet.py:63-75)."""
    out_channels: int
    dropout_p: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return ConvBlock(self.out_channels, self.dropout_p, self.dtype)(x, train=train)


class UpBlock(nn.Module):
    """1x1-conv + bilinear-up (or transpose conv) + skip concat + ConvBlock
    (unet.py:78-99). bilinear=True is the reference's up_type 1 default;
    bilinear=False is the mcnet transpose-conv decoder2 (up_type 0)."""
    skip_channels: int
    out_channels: int
    dropout_p: float = 0.0
    bilinear: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        if self.bilinear:
            x1 = nn.Conv(self.skip_channels, (1, 1), dtype=self.dtype)(x1)
            x1 = upsample2x_bilinear(x1)
        else:
            x1 = nn.ConvTranspose(self.skip_channels, (2, 2), strides=(2, 2), dtype=self.dtype)(x1)
        x = jnp.concatenate([x2, x1], axis=-1)
        return ConvBlock(self.out_channels, self.dropout_p, self.dtype)(x, train=train)


class UpBlockPlus(nn.Module):
    """Like UpBlock but additive skip fusion (unet.py:101-123)."""
    skip_channels: int
    out_channels: int
    dropout_p: float = 0.0
    bilinear: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        if self.bilinear:
            x1 = nn.Conv(self.skip_channels, (1, 1), dtype=self.dtype)(x1)
            x1 = upsample2x_bilinear(x1)
        else:
            x1 = nn.ConvTranspose(self.skip_channels, (2, 2), strides=(2, 2), dtype=self.dtype)(x1)
        x = x2 + x1
        return ConvBlock(self.out_channels, self.dropout_p, self.dtype)(x, train=train)
