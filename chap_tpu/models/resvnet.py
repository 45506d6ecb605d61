"""ResVNet: narrow 3D ResNet-34 encoder (instance norm) + VNet deconv decoder
(reference ResVNet.py:92-196 over resnet3d.py:99-221). Returns
[seg_logits, mid_features] like the reference's decoder output list.
"""
from __future__ import annotations

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp

from chap_tpu.models.vnet3d import ConvBlock3d, UpBlock3d
from chap_tpu.models.voxresnet import _instance_norm


class BasicBlock3d(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        h = nn.Conv(self.planes, (3, 3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype)(x)
        h = nn.relu(_instance_norm(h, self.dtype))
        h = nn.Conv(self.planes, (3, 3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(h)
        h = _instance_norm(h, self.dtype)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype, name="downsample")(x)
            residual = _instance_norm(residual, self.dtype)
        return nn.relu(h + residual)


class ResNetEncoder3d(nn.Module):
    """resnet3d resnet34: 7^3 stride-1 stem (16ch, IN) + 4 stages [3,4,6,3]
    stride-2 -> pyramid [16,32,64,128,256]."""
    base: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        h = nn.Conv(self.base, (7, 7, 7), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.relu(_instance_norm(h, self.dtype))
        feats = [h]
        planes = self.base
        for stage, blocks in enumerate((3, 4, 6, 3)):
            planes *= 2
            for b in range(blocks):
                h = BasicBlock3d(planes, stride=2 if b == 0 else 1,
                                 dtype=self.dtype,
                                 name=f"layer{stage + 1}_block{b}")(h)
            feats.append(h)
        return feats


class ResVNet(nn.Module):
    """ResVNet equivalent; forward(x, turnoff_drop) -> [logits, mid_feats]."""
    num_classes: int = 2
    n_filters: int = 16
    normalization: str = "instancenorm"
    has_dropout: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 turnoff_drop: bool = False):
        nf = self.n_filters
        feats = ResNetEncoder3d(nf, self.dtype, name="resencoder")(x)
        x1, x2, x3, x4, x5 = feats
        use_drop = self.has_dropout and train and not turnoff_drop

        def block(n_stages, ch, name, h):
            return ConvBlock3d(n_stages, ch, self.normalization, self.dtype,
                               name=name)(h, train=train)

        h = UpBlock3d(8 * nf, self.normalization, 0, self.dtype,
                      name="block_five_up")(x5, train=train) + x4
        x6 = block(3, 8 * nf, "block_six", h)
        h = UpBlock3d(4 * nf, self.normalization, 0, self.dtype,
                      name="block_six_up")(x6, train=train) + x3
        h = block(3, 4 * nf, "block_seven", h)
        h = UpBlock3d(2 * nf, self.normalization, 0, self.dtype,
                      name="block_seven_up")(h, train=train) + x2
        h = block(2, 2 * nf, "block_eight", h)
        h = UpBlock3d(nf, self.normalization, 0, self.dtype,
                      name="block_eight_up")(h, train=train) + x1
        h = block(1, nf, "branch_conv", h)
        if use_drop:
            keep = jax.random.bernoulli(self.make_rng("dropout"), 0.5, h.shape)
            h = h * keep / 0.5
        logits = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                         name="branch_out")(h)
        return [logits, x6]
