"""Long-tail model variants from ResNet2d.py.

UNet_2dBCP (:382-398) and UNet_tsne (:401-454) are the standard UNet with
plain / feature-returning decoders — thin wrappers over
chap_tpu.models.unet2d.UNet here. net_D (:358-379) is the flattened MLP
discriminator with tanh activations (GRL lives in chap_tpu.models.grl).
TinyUNet3D (:457-532) is the small 3-scale 3D UNet emitting multiscale
softmax maps in train mode.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from chap_tpu.models.unet2d import UNet


class UNet2dBCP(UNet):
    """UNet_2dBCP equivalent — identical topology to the plain UNet."""


class UNetTsne(nn.Module):
    """UNet_tsne: forward -> (logits, final decoder features) + contrastive
    projection/prediction heads."""
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = UNet(num_classes=self.num_classes, dtype=self.dtype)
        self.projection_head = nn.Sequential([nn.Dense(32), nn.relu, nn.Dense(32)])
        self.prediction_head = nn.Sequential([nn.Dense(32), nn.relu, nn.Dense(32)])

    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        return self.backbone(x, train=train, with_feats=True)

    def forward_projection_head(self, features):
        return self.projection_head(features)

    def forward_prediction_head(self, features):
        return self.prediction_head(features)


class NetD(nn.Module):
    """net_D: flatten -> Linear/2 -> tanh -> Linear/4 -> tanh -> Linear(1)
    -> sigmoid."""
    total_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x.reshape(1, -1)
        h = jnp.tanh(nn.Dense(self.total_dim // 2, dtype=self.dtype)(h))
        h = jnp.tanh(nn.Dense(self.total_dim // 4, dtype=self.dtype)(h))
        return nn.sigmoid(nn.Dense(1, dtype=self.dtype)(h))


class TinyUNet3D(nn.Module):
    """Small 3-scale 3D UNet returning multiscale softmax maps in train mode
    (ResNet2d.py:457-532 UNet_3D)."""
    num_classes: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        def block(h, ch, name):
            h = nn.Conv(ch, (3, 3, 3), padding=1, dtype=self.dtype,
                        name=f"{name}_conv")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name=f"{name}_bn")(h)
            return nn.relu(h)

        e1 = block(x, 16, "enc1")
        p1 = nn.max_pool(e1, (2, 2, 2), strides=(2, 2, 2))
        e2 = block(p1, 32, "enc2")
        p2 = nn.max_pool(e2, (2, 2, 2), strides=(2, 2, 2))
        e3 = block(p2, 64, "enc3")

        from chap_tpu.models.layers import upsample2x_trilinear
        d2 = block(jnp.concatenate([upsample2x_trilinear(e3), e2], -1), 32, "dec2")
        d1 = block(jnp.concatenate([upsample2x_trilinear(d2), e1], -1), 16, "dec1")
        out = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype, name="out")(d1)
        if train:
            m3 = jax.nn.softmax(nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                                        name="ms3")(e3), axis=-1)
            m2 = jax.nn.softmax(nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                                        name="ms2")(d2), axis=-1)
            return out, (m2, m3)
        return out
