"""Deep-supervised semi 3D UNet (reference unet_3D_dv_semi.py:13-106): classic
3D UNet backbone returning FOUR deep-supervision outputs upsampled to input
resolution.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from chap_tpu.models.attention3d import UnetDsv3
from chap_tpu.models.unet3d import UnetConv3, UnetUp3CT


class UNet3DDvSemi(nn.Module):
    """unet_3D_dv_semi equivalent: -> (dsv1, dsv2, dsv3, dsv4)."""
    num_classes: int
    feature_scale: int = 4
    is_batchnorm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
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
        center = nn.Dropout(0.3, deterministic=not train)(center)

        up4 = UnetUp3CT(filters[3], self.is_batchnorm, self.dtype, name="up_concat4")(conv4, center, train=train)
        up3 = UnetUp3CT(filters[2], self.is_batchnorm, self.dtype, name="up_concat3")(conv3, up4, train=train)
        up2 = UnetUp3CT(filters[1], self.is_batchnorm, self.dtype, name="up_concat2")(conv2, up3, train=train)
        up1 = UnetUp3CT(filters[0], self.is_batchnorm, self.dtype, name="up_concat1")(conv1, up2, train=train)
        up1 = nn.Dropout(0.3, deterministic=not train)(up1)

        dsv4 = UnetDsv3(self.num_classes, 8, self.dtype, name="dsv4")(up4)
        dsv3 = UnetDsv3(self.num_classes, 4, self.dtype, name="dsv3")(up3)
        dsv2 = UnetDsv3(self.num_classes, 2, self.dtype, name="dsv2")(up2)
        dsv1 = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype, name="dsv1")(up1)
        return dsv1, dsv2, dsv3, dsv4
