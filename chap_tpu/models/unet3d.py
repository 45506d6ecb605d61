"""Classic 3D U-Net — the BraTS path (reference unet_3D.py:20-100, blocks from
networks/utils.py UnetConv3 :99-124 and UnetUp3_CT :237-278).

Filters [64,128,256,512,1024]/feature_scale (default scale 4 -> [16,...,256]),
dropout 0.3 at the center and after the last up block.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp



class UnetConv3(nn.Module):
    """2x (conv3x3x3 -> [norm] -> ReLU).

    NB: the reference's UnetConv3 applies nn.InstanceNorm3d even though the
    flag is named is_batchnorm (networks/utils.py:103-110) — matched here
    (affine-free per-instance normalization)."""
    out_channels: int
    is_batchnorm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        for _ in range(2):
            x = nn.Conv(self.out_channels, (3, 3, 3), padding=1, dtype=self.dtype)(x)
            if self.is_batchnorm:
                mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
                var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
                x = ((x - mean) / jnp.sqrt(var + 1e-5)).astype(self.dtype)
            x = nn.relu(x)
        return x


class UnetUp3CT(nn.Module):
    """Trilinear 2x upsample (align_corners=False, the torch nn.Upsample
    default at networks/utils.py:264) + skip concat + UnetConv3."""
    out_channels: int
    is_batchnorm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, skip: jnp.ndarray, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        n, d, h, w, c = x.shape
        # half-pixel-centered trilinear == jax.image.resize 'linear'
        x = jax.image.resize(x, (n, 2 * d, 2 * h, 2 * w, c), method="linear")
        x = jnp.concatenate([skip, x], axis=-1)
        return UnetConv3(self.out_channels, self.is_batchnorm, self.dtype)(x, train=train)


class UNet3D(nn.Module):
    """unet_3D equivalent (NDHWC). Needs rng 'dropout' in train mode."""
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
        center = nn.Dropout(rate=0.3, deterministic=not train)(center)

        up4 = UnetUp3CT(filters[3], self.is_batchnorm, self.dtype, name="up_concat4")(conv4, center, train=train)
        up3 = UnetUp3CT(filters[2], self.is_batchnorm, self.dtype, name="up_concat3")(conv3, up4, train=train)
        up2 = UnetUp3CT(filters[1], self.is_batchnorm, self.dtype, name="up_concat2")(conv2, up3, train=train)
        up1 = UnetUp3CT(filters[0], self.is_batchnorm, self.dtype, name="up_concat1")(conv1, up2, train=train)
        up1 = nn.Dropout(rate=0.3, deterministic=not train)(up1)

        return nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype, name="final")(up1)
