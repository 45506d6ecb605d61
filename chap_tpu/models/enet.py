"""ENet (reference enet.py:5-614): initial conv+pool concat block, bottleneck
stages with regular / dilated / asymmetric convs, downsampling bottlenecks
with max-pool indices, and upsampling bottlenecks with max-unpool.

TPU-native unpooling: torch's MaxUnpool2d needs pooling indices; here the
unpool is the VJP of the max-pool — ``jax.vjp(max_pool, x)`` yields a pullback
that routes values back to the argmax positions, exactly max-unpool, without
materializing index tensors (and it compiles to a fused scatter).
"""
from __future__ import annotations

from typing import Callable, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _max_pool_with_unpool(x: jnp.ndarray) -> Tuple[jnp.ndarray, Callable]:
    pool = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))
    pooled, vjp = jax.vjp(pool, x)
    return pooled, lambda u: vjp(u)[0]


class InitialBlock(nn.Module):
    """3x3 stride-2 conv (13ch) concat 2x2 maxpool of input (enet.py:5-68)."""
    out_channels: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        main = nn.Conv(self.out_channels - x.shape[-1], (3, 3), strides=2,
                       padding=1, use_bias=False, dtype=self.dtype)(x)
        ext = nn.max_pool(x, (2, 2), strides=(2, 2))
        out = jnp.concatenate([main, ext], axis=-1)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=self.dtype)(out)
        return nn.PReLU()(out)


class RegularBottleneck(nn.Module):
    """1x1 reduce -> (regular | dilated | asymmetric 5x1+1x5) -> 1x1 expand,
    spatial dropout, residual add (enet.py:71-207)."""
    channels: int
    internal_ratio: int = 4
    dilation: int = 1
    asymmetric: bool = False
    dropout_p: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        inter = self.channels // self.internal_ratio
        h = nn.Conv(inter, (1, 1), use_bias=False, dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        h = nn.PReLU()(h)
        if self.asymmetric:
            h = nn.Conv(inter, (5, 1), padding=((2, 2), (0, 0)), use_bias=False,
                        dtype=self.dtype)(h)
            h = nn.Conv(inter, (1, 5), padding=((0, 0), (2, 2)), use_bias=False,
                        dtype=self.dtype)(h)
        else:
            h = nn.Conv(inter, (3, 3), padding=self.dilation,
                        kernel_dilation=self.dilation, use_bias=False,
                        dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        h = nn.PReLU()(h)
        h = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        if self.dropout_p > 0 and train:
            b, _, _, c = h.shape
            keep = jax.random.bernoulli(self.make_rng("dropout"),
                                        1 - self.dropout_p, (b, 1, 1, c))
            h = h * keep / (1 - self.dropout_p)
        return nn.PReLU()(x + h)


class DownsamplingBottleneck(nn.Module):
    """Main branch maxpool + zero-pad channels; ext branch 2x2 stride-2 conv
    (enet.py:209-320). Returns (out, unpool_fn)."""
    out_channels: int
    internal_ratio: int = 4
    dropout_p: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool):
        main, unpool = _max_pool_with_unpool(x)
        pad = self.out_channels - x.shape[-1]
        main = jnp.pad(main, ((0, 0), (0, 0), (0, 0), (0, pad)))

        inter = self.out_channels // self.internal_ratio
        h = nn.Conv(inter, (2, 2), strides=2, use_bias=False, dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        h = nn.PReLU()(h)
        h = nn.Conv(inter, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        h = nn.PReLU()(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        if self.dropout_p > 0 and train:
            b, _, _, c = h.shape
            keep = jax.random.bernoulli(self.make_rng("dropout"),
                                        1 - self.dropout_p, (b, 1, 1, c))
            h = h * keep / (1 - self.dropout_p)
        return nn.PReLU()(main + h), unpool


class UpsamplingBottleneck(nn.Module):
    """Main branch 1x1 conv + max-unpool; ext branch deconv (enet.py:322-451)."""
    out_channels: int
    internal_ratio: int = 4
    dropout_p: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, unpool: Callable, *, train: bool) -> jnp.ndarray:
        main = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype)(x)
        main = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(main)
        main = unpool(main)

        inter = self.out_channels // self.internal_ratio
        h = nn.Conv(inter, (1, 1), use_bias=False, dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        h = nn.PReLU()(h)
        h = nn.ConvTranspose(inter, (2, 2), strides=(2, 2), use_bias=False,
                             dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        h = nn.PReLU()(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        if self.dropout_p > 0 and train:
            b, _, _, c = h.shape
            keep = jax.random.bernoulli(self.make_rng("dropout"),
                                        1 - self.dropout_p, (b, 1, 1, c))
            h = h * keep / (1 - self.dropout_p)
        return nn.PReLU()(main + h)


class ENet(nn.Module):
    """ENet (enet.py:453-614). Needs rng 'dropout' in train mode."""
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        h = InitialBlock(16, self.dtype, name="initial")(x, train=train)

        # stage 1
        h, unpool1 = DownsamplingBottleneck(64, dropout_p=0.01, dtype=self.dtype,
                                            name="down1_0")(h, train=train)
        for i in range(4):
            h = RegularBottleneck(64, dropout_p=0.01, dtype=self.dtype,
                                  name=f"reg1_{i + 1}")(h, train=train)

        # stage 2
        h, unpool2 = DownsamplingBottleneck(128, dropout_p=0.1, dtype=self.dtype,
                                            name="down2_0")(h, train=train)
        for stage in (2, 3):
            h = RegularBottleneck(128, dtype=self.dtype, name=f"reg{stage}_1")(h, train=train)
            h = RegularBottleneck(128, dilation=2, dtype=self.dtype,
                                  name=f"dil{stage}_2")(h, train=train)
            h = RegularBottleneck(128, asymmetric=True, dtype=self.dtype,
                                  name=f"asym{stage}_3")(h, train=train)
            h = RegularBottleneck(128, dilation=4, dtype=self.dtype,
                                  name=f"dil{stage}_4")(h, train=train)
            h = RegularBottleneck(128, dtype=self.dtype, name=f"reg{stage}_5")(h, train=train)
            h = RegularBottleneck(128, dilation=8, dtype=self.dtype,
                                  name=f"dil{stage}_6")(h, train=train)
            h = RegularBottleneck(128, asymmetric=True, dtype=self.dtype,
                                  name=f"asym{stage}_7")(h, train=train)
            h = RegularBottleneck(128, dilation=16, dtype=self.dtype,
                                  name=f"dil{stage}_8")(h, train=train)

        # stage 4
        h = UpsamplingBottleneck(64, dtype=self.dtype, name="up4_0")(h, unpool2, train=train)
        h = RegularBottleneck(64, dtype=self.dtype, name="reg4_1")(h, train=train)
        h = RegularBottleneck(64, dtype=self.dtype, name="reg4_2")(h, train=train)

        # stage 5
        h = UpsamplingBottleneck(16, dtype=self.dtype, name="up5_0")(h, unpool1, train=train)
        h = RegularBottleneck(16, dtype=self.dtype, name="reg5_1")(h, train=train)

        return nn.ConvTranspose(self.num_classes, (3, 3), strides=(2, 2),
                                dtype=self.dtype, name="fullconv")(h)
