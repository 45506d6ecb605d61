"""Attention-gated 3D U-Net (reference attention_unet.py:9-136 with grid
attention from grid_attention_layer.py:7-181 and deep-supervision heads from
networks/utils.py UnetDsv3/UnetGridGatingSignal3).

NDHWC Flax rebuild: gating signal from the bottleneck, two parallel grid
attention blocks per skip (concatenation mode), dsv heads upsampled and fused
by a 1x1 conv.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from chap_tpu.models.unet3d import UnetConv3, UnetUp3CT


def _resize_trilinear(x: jnp.ndarray, size: Tuple[int, int, int]) -> jnp.ndarray:
    """Half-pixel (align_corners=False) trilinear resize of NDHWC — matching
    the reference's F.upsample/nn.Upsample defaults in the attention gates and
    dsv heads (grid_attention_layer.py:95-105, utils.py UnetDsv3)."""
    n, _, _, _, c = x.shape
    return jax.image.resize(x, (n,) + tuple(size) + (c,), method="linear")


class GridAttentionBlock3D(nn.Module):
    """'concatenation' grid attention (grid_attention_layer.py:84-159):
    theta(x) strided to the attention grid, phi(g) resized onto it, additive
    ReLU fusion, psi -> sigmoid gate resized back onto x, output 1x1 conv+BN."""
    inter_channels: int
    sub_sample_factor: Tuple[int, int, int] = (2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: jnp.ndarray, *, train: bool):
        in_channels = x.shape[-1]
        ssf = self.sub_sample_factor
        theta_x = nn.Conv(self.inter_channels, ssf, strides=ssf, use_bias=False,
                          dtype=self.dtype, name="theta")(x)
        phi_g = nn.Conv(self.inter_channels, (1, 1, 1), dtype=self.dtype,
                        name="phi")(g)
        phi_g = _resize_trilinear(phi_g, theta_x.shape[1:4])
        f = nn.relu(theta_x + phi_g)
        psi = nn.Conv(1, (1, 1, 1), dtype=self.dtype, name="psi")(f)
        gate = jax.nn.sigmoid(psi)
        gate = _resize_trilinear(gate, x.shape[1:4])
        y = x * gate
        w_y = nn.Conv(in_channels, (1, 1, 1), dtype=self.dtype, name="W")(y)
        w_y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=self.dtype)(w_y)
        return w_y, gate


class MultiAttentionBlock(nn.Module):
    """Two parallel gates + 1x1 combine (attention_unet.py:113-136)."""
    inter_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: jnp.ndarray, *, train: bool):
        g1, a1 = GridAttentionBlock3D(self.inter_channels, dtype=self.dtype,
                                      name="gate_block_1")(x, g, train=train)
        g2, a2 = GridAttentionBlock3D(self.inter_channels, dtype=self.dtype,
                                      name="gate_block_2")(x, g, train=train)
        h = jnp.concatenate([g1, g2], axis=-1)
        h = nn.Conv(x.shape[-1], (1, 1, 1), dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(h)
        return nn.relu(h), jnp.concatenate([a1, a2], axis=-1)


class UnetDsv3(nn.Module):
    """1x1 conv + trilinear upsample deep-supervision head."""
    num_classes: int
    scale_factor: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype)(x)
        size = tuple(s * self.scale_factor for s in x.shape[1:4])
        return _resize_trilinear(h, size)


class AttentionUNet3D(nn.Module):
    """Attention_UNet equivalent."""
    num_classes: int
    feature_scale: int = 4
    is_batchnorm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        filters = [f // self.feature_scale for f in (64, 128, 256, 512, 1024)]

        conv1 = UnetConv3(filters[0], self.is_batchnorm, self.dtype, name="conv1")(x, train=train)
        p1 = nn.max_pool(conv1, (2, 2, 2), strides=(2, 2, 2))
        conv2 = UnetConv3(filters[1], self.is_batchnorm, self.dtype, name="conv2")(p1, train=train)
        p2 = nn.max_pool(conv2, (2, 2, 2), strides=(2, 2, 2))
        conv3 = UnetConv3(filters[2], self.is_batchnorm, self.dtype, name="conv3")(p2, train=train)
        p3 = nn.max_pool(conv3, (2, 2, 2), strides=(2, 2, 2))
        conv4 = UnetConv3(filters[3], self.is_batchnorm, self.dtype, name="conv4")(p3, train=train)
        p4 = nn.max_pool(conv4, (2, 2, 2), strides=(2, 2, 2))

        center = UnetConv3(filters[4], self.is_batchnorm, self.dtype, name="center")(p4, train=train)
        # UnetGridGatingSignal3: conv1x1 + InstanceNorm + ReLU (utils.py:192-204
        # — like UnetConv3, its is_batchnorm flag actually selects InstanceNorm)
        gating = nn.Conv(filters[4], (1, 1, 1), dtype=self.dtype, name="gating_conv")(center)
        g_mean = jnp.mean(gating, axis=(1, 2, 3), keepdims=True)
        g_var = jnp.var(gating, axis=(1, 2, 3), keepdims=True)
        gating = nn.relu((gating - g_mean) / jnp.sqrt(g_var + 1e-5))

        g4, _ = MultiAttentionBlock(filters[3], self.dtype, name="attentionblock4")(conv4, gating, train=train)
        up4 = UnetUp3CT(filters[3], self.is_batchnorm, self.dtype, name="up_concat4")(g4, center, train=train)
        g3, _ = MultiAttentionBlock(filters[2], self.dtype, name="attentionblock3")(conv3, up4, train=train)
        up3 = UnetUp3CT(filters[2], self.is_batchnorm, self.dtype, name="up_concat3")(g3, up4, train=train)
        g2, _ = MultiAttentionBlock(filters[1], self.dtype, name="attentionblock2")(conv2, up3, train=train)
        up2 = UnetUp3CT(filters[1], self.is_batchnorm, self.dtype, name="up_concat2")(g2, up3, train=train)
        up1 = UnetUp3CT(filters[0], self.is_batchnorm, self.dtype, name="up_concat1")(conv1, up2, train=train)

        dsv4 = UnetDsv3(self.num_classes, 8, self.dtype, name="dsv4")(up4)
        dsv3 = UnetDsv3(self.num_classes, 4, self.dtype, name="dsv3")(up3)
        dsv2 = UnetDsv3(self.num_classes, 2, self.dtype, name="dsv2")(up2)
        dsv1 = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype, name="dsv1")(up1)
        fused = jnp.concatenate([dsv1, dsv2, dsv3, dsv4], axis=-1)
        return nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype, name="final")(fused)
