"""Adversarial discriminators (reference discriminator.py:6-104).

FC3DDiscriminator: two-stream (probability map + image) 3D conv classifier.
FCDiscriminator: 2D fully-convolutional map discriminator.
NHWC / NDHWC Flax rebuilds.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class FC3DDiscriminator(nn.Module):
    """(prob map, image) -> [B, 2] logits (discriminator.py:6-55)."""
    num_classes: int
    ndf: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, seg_map: jnp.ndarray, image: jnp.ndarray) -> jnp.ndarray:
        h0 = nn.Conv(self.ndf, (4, 4, 4), strides=2, padding=1,
                     dtype=self.dtype, name="conv0")(seg_map)
        h1 = nn.Conv(self.ndf, (4, 4, 4), strides=2, padding=1,
                     dtype=self.dtype, name="conv1")(image)
        h = nn.leaky_relu(h0 + h1, negative_slope=0.2)
        for i, mult in enumerate((2, 4, 8)):
            h = nn.Conv(self.ndf * mult, (4, 4, 4), strides=2, padding=1,
                        dtype=self.dtype, name=f"conv{i + 2}")(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
        h = jnp.mean(h, axis=(1, 2, 3))  # global average pool
        return nn.Dense(2, dtype=self.dtype, name="classifier")(h)


class FCDiscriminator(nn.Module):
    """Fully-convolutional 2D map discriminator (discriminator.py:58-104)."""
    num_classes: int
    ndf: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, mult in enumerate((1, 2, 4, 8)):
            x = nn.Conv(self.ndf * mult, (4, 4), strides=2, padding=1,
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        return nn.Conv(1, (4, 4), strides=2, padding=1, dtype=self.dtype,
                       name="classifier")(x)
