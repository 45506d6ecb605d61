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
    """Grid attention (grid_attention_layer.py:84-159): theta(x) strided to
    the attention grid, phi(g) resized onto it, additive fusion, psi -> gate
    resized back onto x, output 1x1 conv+BN.

    ``mode`` selects the gate nonlinearity like the reference's
    operation_function dispatch (grid_attention_layer.py:57-65):
      concatenation          ReLU fusion, sigmoid gate        (:84-107)
      concatenation_debug    softplus fusion, sigmoid gate    (:109-132)
      concatenation_residual ReLU fusion, softmax-over-space  (:135-159)
    """
    inter_channels: int
    sub_sample_factor: Tuple[int, int, int] = (2, 2, 2)
    mode: str = "concatenation"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: jnp.ndarray, *, train: bool):
        if self.mode not in ("concatenation", "concatenation_debug",
                             "concatenation_residual"):
            raise ValueError(f"unknown grid-attention mode {self.mode!r}")
        in_channels = x.shape[-1]
        ssf = self.sub_sample_factor
        theta_x = nn.Conv(self.inter_channels, ssf, strides=ssf, use_bias=False,
                          dtype=self.dtype, name="theta")(x)
        phi_g = nn.Conv(self.inter_channels, (1, 1, 1), dtype=self.dtype,
                        name="phi")(g)
        phi_g = _resize_trilinear(phi_g, theta_x.shape[1:4])
        fuse = nn.softplus if self.mode == "concatenation_debug" else nn.relu
        f = fuse(theta_x + phi_g)
        psi = nn.Conv(1, (1, 1, 1), dtype=self.dtype, name="psi")(f)
        if self.mode == "concatenation_residual":
            b = psi.shape[0]
            gate = jax.nn.softmax(psi.reshape(b, -1), axis=1).reshape(psi.shape)
        else:
            gate = jax.nn.sigmoid(psi)
        gate = _resize_trilinear(gate, x.shape[1:4])
        y = x * gate
        w_y = nn.Conv(in_channels, (1, 1, 1), dtype=self.dtype, name="W")(y)
        w_y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           dtype=self.dtype)(w_y)
        return w_y, gate


class GridAttentionBlockTORR(nn.Module):
    """The _TORR grid-attention family (grid_attention_layer.py:183-381),
    rank-generic (2D or 3D from the input rank). Differences from the plain
    block: phi is STRIDED like theta (:243-245), convs are unpadded
    (:239-249), any of W/theta/phi/psi can be toggled to identity
    (:222-227,252-258), psi's bias initializes to 3.0 (sigmoid mode) or 10.0
    (softmax mode) (:265-269), and the gate normalization over flattened
    space comes in five flavors (:318-348). The reference's plain
    'concatenation' mode raises NotImplementedError in this class (:347-348),
    so it is rejected here too."""
    inter_channels: int
    mode: str = "concatenation_softmax"
    sub_sample_factor: Tuple[int, ...] = (1, 1, 1)
    bn_layer: bool = True
    use_w: bool = True
    use_phi: bool = True
    use_theta: bool = True
    use_psi: bool = True
    nonlinearity1: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: jnp.ndarray, *, train: bool):
        modes = ("concatenation_softmax", "concatenation_sigmoid",
                 "concatenation_mean", "concatenation_mean_flow",
                 "concatenation_range_normalise")
        if self.mode not in modes:
            raise ValueError(f"unsupported TORR mode {self.mode!r} "
                             f"(reference supports only {modes})")
        n_sp = x.ndim - 2
        ssf = tuple(self.sub_sample_factor)[:n_sp] or (1,) * n_sp
        in_channels = x.shape[-1]

        theta_x = nn.Conv(self.inter_channels, ssf, strides=ssf, padding=0,
                          use_bias=False, dtype=self.dtype, name="theta")(x) \
            if self.use_theta else x
        phi_g = nn.Conv(self.inter_channels, ssf, strides=ssf, padding=0,
                        use_bias=False, dtype=self.dtype, name="phi")(g) \
            if self.use_phi else g
        if phi_g.shape[1:-1] != theta_x.shape[1:-1]:
            phi_g = jax.image.resize(
                phi_g, theta_x.shape[:1] + theta_x.shape[1:-1] + phi_g.shape[-1:],
                method="linear")
        f = theta_x + phi_g
        if self.nonlinearity1 == "relu":
            f = nn.relu(f)

        if self.use_psi:
            bias_init = {"concatenation_sigmoid": 3.0,
                         "concatenation_softmax": 10.0}.get(self.mode, 0.0)
            psi_f = nn.Conv(1, (1,) * n_sp, dtype=self.dtype, name="psi",
                            bias_init=nn.initializers.constant(bias_init))(f)
        else:
            psi_f = f

        b = psi_f.shape[0]
        flat = psi_f.reshape(b, -1)
        if self.mode == "concatenation_softmax":
            gate = jax.nn.softmax(flat, axis=1)
        elif self.mode == "concatenation_mean":
            gate = flat / jnp.sum(flat, axis=1, keepdims=True)
        elif self.mode == "concatenation_mean_flow":
            shifted = flat - jnp.min(flat, axis=1, keepdims=True)
            gate = shifted / jnp.sum(shifted, axis=1, keepdims=True)
        elif self.mode == "concatenation_range_normalise":
            lo = jnp.min(flat, axis=1, keepdims=True)
            hi = jnp.max(flat, axis=1, keepdims=True)
            gate = (flat - lo) / (hi - lo)
        else:  # concatenation_sigmoid
            gate = jax.nn.sigmoid(flat)
        gate = gate.reshape(psi_f.shape[:-1] + (1,))
        gate = jax.image.resize(
            gate, x.shape[:1] + x.shape[1:-1] + (1,), method="linear")

        y = x * gate
        if self.use_w:
            w_y = nn.Conv(in_channels, (1,) * n_sp, dtype=self.dtype,
                          name="W")(y)
            if self.bn_layer:
                w_y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                   dtype=self.dtype)(w_y)
        else:
            w_y = y
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
