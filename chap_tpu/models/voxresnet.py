"""VoxResNet (reference VoxResNet.py:26-116): pre-activation instance-norm
residual blocks at a single width, two maxpool downsamples, skip-concat
trilinear up path. NDHWC Flax rebuild."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from chap_tpu.models.layers import upsample2x_trilinear


def _instance_norm(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """torch nn.InstanceNorm3d default: no affine, per-sample/channel stats."""
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
    return ((x - mean) / jnp.sqrt(var + 1e-5)).astype(dtype)


class VoxRex(nn.Module):
    """IN-ReLU-conv-IN-ReLU-conv + skip (VoxResNet.py:26-41)."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(_instance_norm(x, self.dtype))
        h = nn.Conv(self.channels, (3, 3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.relu(_instance_norm(h, self.dtype))
        h = nn.Conv(self.channels, (3, 3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(h)
        return h + x


class VoxConvBlock(nn.Module):
    """Pre-activation double conv (VoxResNet.py:44-61)."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(_instance_norm(x, self.dtype))
        h = nn.Conv(self.out_channels, (3, 3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.relu(_instance_norm(h, self.dtype))
        h = nn.Conv(self.out_channels, (3, 3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(h)
        return h


class VoxResNet(nn.Module):
    """VoxResNet.py:79-116 equivalent (train flag accepted for API parity;
    the model is norm-stat free)."""
    num_classes: int = 2
    feature_chns: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        nf = self.feature_chns
        x = nn.Conv(nf, (3, 3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x1 = VoxRex(nf, self.dtype, name="res1")(x)
        x2 = VoxRex(nf, self.dtype, name="res2")(x1)
        x2_pool = nn.max_pool(x2, (2, 2, 2), strides=(2, 2, 2))
        x3 = VoxRex(nf, self.dtype, name="res3")(x2_pool)
        x4 = nn.max_pool(VoxRex(nf, self.dtype, name="res4")(x3),
                         (2, 2, 2), strides=(2, 2, 2))
        x5 = VoxRex(nf, self.dtype, name="res5")(x4)
        x6 = VoxRex(nf, self.dtype, name="res6")(x5)
        up1 = VoxConvBlock(nf, self.dtype, name="up1_conv")(
            jnp.concatenate([x2_pool, upsample2x_trilinear(x6)], axis=-1))
        up2 = VoxConvBlock(nf, self.dtype, name="up2_conv")(
            jnp.concatenate([x, upsample2x_trilinear(up1)], axis=-1))
        up = upsample2x_trilinear(up2)
        return nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype, name="out")(up)
