"""ResUNet 2D: narrow ResNet-34 encoder + UNet decoder (reference
ResNet2d.py:210-270 over resnet.py resnet34_2d/ResNet2d :242-371,
BasicBlock2d :33-65). Pyramid channels [16,32,64,128,256]; contrastive
projection/prediction heads kept for API parity (ResNet2d.py:224-238).
"""
from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from chap_tpu.models.unet2d import Decoder


class BasicBlock2d(nn.Module):
    """conv3-BN-ReLU-conv3-BN + skip (1x1 conv downsample on stride/width
    change), post-activation ReLU."""
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        residual = x
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype, name="downsample")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    dtype=self.dtype, name="downsample_bn")(residual)
        return nn.relu(h + residual)


class ResNetEncoder2d(nn.Module):
    """resnet34_2d: 7x7 stride-1 stem (16ch) + 4 stages [3,4,6,3] blocks,
    stride 2 each -> pyramid [16,32,64,128,256] at scales 1..1/16."""
    layers: Sequence[int] = (3, 4, 6, 3)
    base: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> List[jnp.ndarray]:
        h = nn.Conv(self.base, (7, 7), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        feats = [h]
        planes = self.base
        for stage, blocks in enumerate(self.layers):
            planes *= 2
            for b in range(blocks):
                h = BasicBlock2d(planes, stride=2 if b == 0 else 1,
                                 dtype=self.dtype,
                                 name=f"layer{stage + 1}_block{b}")(h, train=train)
            feats.append(h)
        return feats


class ResUNet2d(nn.Module):
    """ResUNet_2d equivalent: forward returns logits [B,H,W,C]."""
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ResNetEncoder2d(dtype=self.dtype)
        self.decoder = Decoder(self.num_classes, (16, 32, 64, 128, 256), True, self.dtype)
        self.projection_head = nn.Sequential([
            nn.Dense(32), nn.relu, nn.Dense(32)])
        self.prediction_head = nn.Sequential([
            nn.Dense(32), nn.relu, nn.Dense(32)])

    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        feature = self.encoder(x, train=train)
        return self.decoder(feature, train=train)

    def forward_projection_head(self, features):
        return self.projection_head(features)

    def forward_prediction_head(self, features):
        return self.prediction_head(features)
