"""PNet 2D: stacked dilated conv blocks with multi-rate feature fusion
(reference pnet.py:17-122, DeepIGeoS-style). NHWC Flax rebuild."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class PNetBlock(nn.Module):
    out_channels: int
    dilation: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        for _ in range(2):
            x = nn.Conv(self.out_channels, (3, 3), padding=self.dilation,
                        kernel_dilation=self.dilation, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        return x


class PNet2D(nn.Module):
    """Five dilated blocks (rates `ratios`), concat, 1x1 fuse, dropout head."""
    num_classes: int
    num_filters: int = 64
    ratios: Sequence[int] = (1, 2, 3, 4, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        feats = []
        h = x
        for i, rate in enumerate(self.ratios):
            h = PNetBlock(self.num_filters, rate, self.dtype,
                          name=f"block{i + 1}")(h, train=train)
            feats.append(h)
        h = jnp.concatenate(feats, axis=-1)
        h = nn.leaky_relu(nn.Conv(self.num_filters * 5, (1, 1), dtype=self.dtype)(h), 0.01)
        h = nn.leaky_relu(nn.Conv(self.num_filters * 2, (1, 1), dtype=self.dtype)(h), 0.01)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        h = nn.leaky_relu(nn.Conv(self.num_filters, (1, 1), dtype=self.dtype)(h), 0.01)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(h)
