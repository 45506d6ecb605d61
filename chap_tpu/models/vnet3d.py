"""VNet family for LA / Pancreas 3D segmentation (reference vnet.py:8-336).

Flax linen, NDHWC layout, n_filters=16 base. DualDecoder3d keeps the
reference's decoder asymmetry: decoder1 trilinear-up, decoder2 deconv-up.
"""
from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from chap_tpu.models.layers import upsample2x_trilinear, upsample2x_nearest


def _norm(normalization: str, train: bool, dtype):
    if normalization == "batchnorm":
        return nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=dtype)
    if normalization == "groupnorm":
        return nn.GroupNorm(num_groups=16, dtype=dtype)
    if normalization == "instancenorm":
        return nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                            use_scale=False, dtype=dtype)
    if normalization == "none":
        return None
    raise ValueError(f"unknown normalization {normalization!r}")


class ConvBlock3d(nn.Module):
    """n_stages x (conv3x3x3 -> norm -> relu) (vnet.py:8-34)."""
    n_stages: int
    out_channels: int
    normalization: str = "none"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        for _ in range(self.n_stages):
            x = nn.Conv(self.out_channels, (3, 3, 3), padding=1, dtype=self.dtype)(x)
            norm = _norm(self.normalization, train, self.dtype)
            if norm is not None:
                x = norm(x)
            x = nn.relu(x)
        return x


class ResidualConvBlock3d(nn.Module):
    """Residual variant: relu after skip-add on the last stage (vnet.py:37-67)."""
    n_stages: int
    out_channels: int
    normalization: str = "none"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        residual = x
        for i in range(self.n_stages):
            x = nn.Conv(self.out_channels, (3, 3, 3), padding=1, dtype=self.dtype)(x)
            norm = _norm(self.normalization, train, self.dtype)
            if norm is not None:
                x = norm(x)
            if i != self.n_stages - 1:
                x = nn.relu(x)
        return nn.relu(x + residual)


class DownBlock3d(nn.Module):
    """Strided-conv downsample, kernel=stride=2 (vnet.py:70-94)."""
    out_channels: int
    normalization: str = "none"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        x = nn.Conv(self.out_channels, (2, 2, 2), strides=(2, 2, 2),
                    padding="VALID", dtype=self.dtype)(x)
        norm = _norm(self.normalization, train, self.dtype)
        if norm is not None:
            x = norm(x)
        return nn.relu(x)


class UpBlock3d(nn.Module):
    """Upsampling_function (vnet.py:97-125): mode 0 deconv, 1 trilinear+conv,
    2 nearest+conv; then norm + relu."""
    out_channels: int
    normalization: str = "none"
    mode_upsampling: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        if self.mode_upsampling == 0:
            x = nn.ConvTranspose(self.out_channels, (2, 2, 2), strides=(2, 2, 2),
                                 dtype=self.dtype)(x)
        elif self.mode_upsampling == 1:
            x = upsample2x_trilinear(x)
            x = nn.Conv(self.out_channels, (3, 3, 3), padding=1, dtype=self.dtype)(x)
        elif self.mode_upsampling == 2:
            x = upsample2x_nearest(x, (1, 2, 3))
            x = nn.Conv(self.out_channels, (3, 3, 3), padding=1, dtype=self.dtype)(x)
        norm = _norm(self.normalization, train, self.dtype)
        if norm is not None:
            x = norm(x)
        return nn.relu(x)


class VEncoder(nn.Module):
    """5-scale strided-conv encoder, stages (1,2,3,3,3), channels x(1,2,4,8,16)
    with bottleneck channel-dropout 0.5 (vnet.py:127-168)."""
    n_filters: int = 16
    normalization: str = "none"
    has_dropout: bool = False
    has_residual: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> List[jnp.ndarray]:
        block = ResidualConvBlock3d if self.has_residual else ConvBlock3d
        nf = self.n_filters
        x1 = block(1, nf, self.normalization, self.dtype, name="block_one")(x, train=train)
        d1 = DownBlock3d(2 * nf, self.normalization, self.dtype, name="block_one_dw")(x1, train=train)
        x2 = block(2, 2 * nf, self.normalization, self.dtype, name="block_two")(d1, train=train)
        d2 = DownBlock3d(4 * nf, self.normalization, self.dtype, name="block_two_dw")(x2, train=train)
        x3 = block(3, 4 * nf, self.normalization, self.dtype, name="block_three")(d2, train=train)
        d3 = DownBlock3d(8 * nf, self.normalization, self.dtype, name="block_three_dw")(x3, train=train)
        x4 = block(3, 8 * nf, self.normalization, self.dtype, name="block_four")(d3, train=train)
        d4 = DownBlock3d(16 * nf, self.normalization, self.dtype, name="block_four_dw")(x4, train=train)
        x5 = block(3, 16 * nf, self.normalization, self.dtype, name="block_five")(d4, train=train)
        if self.has_dropout and train:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 0.5, x5.shape).astype(x5.dtype)
            x5 = x5 * keep / 0.5
        return [x1, x2, x3, x4, x5]


class VDecoder(nn.Module):
    """Additive-skip decoder, stages (3,3,3,2,1), 1x1x1 out conv
    (vnet.py:170-223)."""
    num_classes: int
    n_filters: int = 16
    normalization: str = "none"
    has_dropout: bool = False
    has_residual: bool = False
    up_type: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], *, train: bool) -> jnp.ndarray:
        block = ResidualConvBlock3d if self.has_residual else ConvBlock3d
        nf = self.n_filters
        x1, x2, x3, x4, x5 = features
        x = UpBlock3d(8 * nf, self.normalization, self.up_type, self.dtype,
                      name="block_five_up")(x5, train=train) + x4
        x = block(3, 8 * nf, self.normalization, self.dtype, name="block_six")(x, train=train)
        x = UpBlock3d(4 * nf, self.normalization, self.up_type, self.dtype,
                      name="block_six_up")(x, train=train) + x3
        x = block(3, 4 * nf, self.normalization, self.dtype, name="block_seven")(x, train=train)
        x = UpBlock3d(2 * nf, self.normalization, self.up_type, self.dtype,
                      name="block_seven_up")(x, train=train) + x2
        x = block(2, 2 * nf, self.normalization, self.dtype, name="block_eight")(x, train=train)
        x = UpBlock3d(nf, self.normalization, self.up_type, self.dtype,
                      name="block_eight_up")(x, train=train) + x1
        x = block(1, nf, self.normalization, self.dtype, name="block_nine")(x, train=train)
        if self.has_dropout and train:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 0.5, x.shape).astype(x.dtype)
            x = x * keep / 0.5
        return nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype, name="out_conv")(x)


class VNet(nn.Module):
    """Single-decoder VNet, deconv decoder (vnet.py:303-315)."""
    num_classes: int = 2
    n_filters: int = 16
    normalization: str = "none"
    has_dropout: bool = False
    has_residual: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = VEncoder(self.n_filters, self.normalization,
                                self.has_dropout, self.has_residual, self.dtype)
        self.decoder = VDecoder(self.num_classes, self.n_filters, self.normalization,
                                self.has_dropout, self.has_residual, 0, self.dtype)

    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return self.decoder(self.encoder(x, train=train), train=train)


class DualDecoder3d(nn.Module):
    """Shared encoder, decoder1 trilinear / decoder2 deconv (vnet.py:225-238)."""
    num_classes: int = 2
    n_filters: int = 16
    normalization: str = "none"
    has_dropout: bool = False
    has_residual: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = VEncoder(self.n_filters, self.normalization,
                                self.has_dropout, self.has_residual, self.dtype)
        self.decoder1 = VDecoder(self.num_classes, self.n_filters, self.normalization,
                                 self.has_dropout, self.has_residual, 1, self.dtype)
        self.decoder2 = VDecoder(self.num_classes, self.n_filters, self.normalization,
                                 self.has_dropout, self.has_residual, 0, self.dtype)

    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        features = self.encoder(x, train=train)
        return self.decoder1(features, train=train), self.decoder2(features, train=train)
