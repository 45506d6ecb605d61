"""VNet family for LA / Pancreas 3D segmentation (reference vnet.py:8-336).

Flax linen, NDHWC layout, n_filters=16 base. DualDecoder3d keeps the
reference's decoder asymmetry: decoder1 trilinear-up, decoder2 deconv-up.
"""
from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from chap_tpu.models.layers import upsample2x_trilinear, upsample2x_nearest
from chap_tpu.ops.s2d import (conv3d, depth_to_space_3d, phase_view,
                              s2d_conv_kernel, s2d_deconv_kernel,
                              s2d_down_kernel, s2d_out_conv_kernel,
                              s2d_pointwise_kernel, space_to_depth_3d,
                              zpack_conv_kernel, zpack_unpack)


def _norm(normalization: str, train: bool, dtype):
    if normalization == "batchnorm":
        return nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=dtype)
    if normalization == "groupnorm":
        return nn.GroupNorm(num_groups=16, dtype=dtype)
    if normalization == "instancenorm":
        return nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                            use_scale=False, dtype=dtype)
    if normalization == "none":
        return None
    raise ValueError(f"unknown normalization {normalization!r}")


def _norm_maybe_s2d(norm, x: jnp.ndarray, s2d: bool) -> jnp.ndarray:
    """Apply a channel-last norm; in s2d layout, through the [...,8,C] phase
    view so statistics/params are per ORIGINAL channel — the exact same
    element sets as the plain layout."""
    if not s2d:
        return norm(x)
    return norm(phase_view(x)).reshape(x.shape)


class _S2dConv(nn.Module):
    """Stride-1 odd-k conv applied in s2d layout. Parameter tree (names,
    shapes, init) is identical to the `nn.Conv(features, (k,k,k))` it
    replaces; the kernel is rearranged at trace time (ops/s2d.py)."""
    features: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        ci = xs.shape[-1] // 8
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, k, ci, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        w2 = s2d_conv_kernel(kernel.astype(self.dtype))
        y = conv3d(xs.astype(self.dtype), w2)
        return y + jnp.tile(bias.astype(self.dtype), 8)


class _S2dFusedConv(nn.Module):
    """Stride-1 odd-k conv EMITTING the s2d layout: a stride-2 kernel-(k+1)
    conv with trace-time rearranged weights (ops/s2d.py s2d_out_conv_kernel).
    The fast path for narrow-channel stages (Co<=32: 8x wider output lanes
    for 2.37x the FLOPs). With s2d_in the input arrives s2d and the
    depth_to_space relayout fuses into the conv's gather (measured: the
    fused pair costs ~2 ms over the conv alone vs ~13 ms standalone).
    nn.Conv-compatible params."""
    features: int
    s2d_in: bool = False
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        ci = x.shape[-1] // (8 if self.s2d_in else 1)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, k, ci, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.s2d_in:
            x = depth_to_space_3d(x)
        w4 = s2d_out_conv_kernel(kernel.astype(self.dtype))
        r = (k - 1) // 2
        y = conv3d(x.astype(self.dtype), w4, (2, 2, 2), [(r, r)] * 3)
        return y + jnp.tile(bias.astype(self.dtype), 8)


class _ZPackConv(nn.Module):
    """Stride-1 3^3 conv computing 4 consecutive z outputs as channel groups
    (ops/s2d.py zpack_conv_kernel): widens a Co<=32 output to 4*Co MXU lanes
    for 2x the FLOPs, and the unpack back to plain layout is a contiguous
    reshape (no transpose). nn.Conv-compatible params."""
    features: int
    factor: int = 4
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        ci = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, k, ci, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        wz = zpack_conv_kernel(kernel.astype(self.dtype), self.factor)
        r = (k - 1) // 2
        y = conv3d(x.astype(self.dtype), wz, (1, 1, self.factor),
                   [(r, r)] * 3)
        y = y + jnp.tile(bias.astype(self.dtype), self.factor)
        return zpack_unpack(y, self.features)


class _S2dDownConv(nn.Module):
    """kernel=stride=2 down conv on s2d input == a pure 1x1x1 conv; output is
    the plain (not s2d) half-resolution tensor. nn.Conv-compatible params."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        ci = xs.shape[-1] // 8
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, 2, ci, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = conv3d(xs.astype(self.dtype), s2d_down_kernel(kernel.astype(self.dtype)))
        return y + bias.astype(self.dtype)


class _S2dDeconv(nn.Module):
    """kernel=stride=2 transpose conv from a PLAIN input to an S2D-layout
    output (the 8 phases as channels). nn.ConvTranspose-compatible params."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ci = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, 2, ci, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = conv3d(x.astype(self.dtype), s2d_deconv_kernel(kernel.astype(self.dtype)))
        return y + jnp.tile(bias.astype(self.dtype), 8)


class _S2dPointwise(nn.Module):
    """1x1x1 conv in s2d layout (block-diagonal over phases). nn.Conv-compatible."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        ci = xs.shape[-1] // 8
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, 1, ci, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = conv3d(xs.astype(self.dtype), s2d_pointwise_kernel(kernel.astype(self.dtype)))
        return y + jnp.tile(bias.astype(self.dtype), 8)


class ConvBlock3d(nn.Module):
    """n_stages x (conv3x3x3 -> norm -> relu) (vnet.py:8-34). With s2d=True
    the block runs in space-to-depth layout (input AND output s2d) — exact,
    see ops/s2d.py."""
    n_stages: int
    out_channels: int
    normalization: str = "none"
    dtype: jnp.dtype = jnp.float32
    s2d: bool = False          # dense s2d-space convs (input AND output s2d)
    s2d_fused: bool = False    # k4-stride2 convs emitting s2d (see _S2dFusedConv)
    s2d_in: bool = False       # with s2d_fused: whether the block INPUT is s2d
    zpack: bool = False        # z-packed convs for narrow outputs (_ZPackConv)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        for i in range(self.n_stages):
            if self.s2d_fused:
                x = _S2dFusedConv(self.out_channels,
                                  s2d_in=(self.s2d_in or i > 0), dtype=self.dtype,
                                  name=f"Conv_{i}")(x)
            elif self.s2d:
                x = _S2dConv(self.out_channels, 3, self.dtype,
                             name=f"Conv_{i}")(x)
            elif (self.zpack and x.shape[3] % 4 == 0
                  and self.out_channels <= 32):
                x = _ZPackConv(self.out_channels, 4, 3, self.dtype,
                               name=f"Conv_{i}")(x)
            else:
                x = nn.Conv(self.out_channels, (3, 3, 3), padding=1,
                            dtype=self.dtype)(x)
            norm = _norm(self.normalization, train, self.dtype)
            if norm is not None:
                x = _norm_maybe_s2d(norm, x, self.s2d or self.s2d_fused)
            x = nn.relu(x)
        return x


class ResidualConvBlock3d(nn.Module):
    """Residual variant: relu after skip-add on the last stage (vnet.py:37-67)."""
    n_stages: int
    out_channels: int
    normalization: str = "none"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        residual = x
        for i in range(self.n_stages):
            x = nn.Conv(self.out_channels, (3, 3, 3), padding=1, dtype=self.dtype)(x)
            norm = _norm(self.normalization, train, self.dtype)
            if norm is not None:
                x = norm(x)
            if i != self.n_stages - 1:
                x = nn.relu(x)
        return nn.relu(x + residual)


class DownBlock3d(nn.Module):
    """Strided-conv downsample, kernel=stride=2 (vnet.py:70-94). With
    s2d_in=True the input is s2d-layout and the conv collapses to an exact
    1x1x1 conv; the output is the usual plain half-resolution tensor."""
    out_channels: int
    normalization: str = "none"
    dtype: jnp.dtype = jnp.float32
    s2d_in: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        if self.s2d_in:
            x = _S2dDownConv(self.out_channels, self.dtype, name="Conv_0")(x)
        else:
            x = nn.Conv(self.out_channels, (2, 2, 2), strides=(2, 2, 2),
                        padding="VALID", dtype=self.dtype)(x)
        norm = _norm(self.normalization, train, self.dtype)
        if norm is not None:
            x = norm(x)
        return nn.relu(x)


class UpBlock3d(nn.Module):
    """Upsampling_function (vnet.py:97-125): mode 0 deconv, 1 trilinear+conv,
    2 nearest+conv; then norm + relu."""
    out_channels: int
    normalization: str = "none"
    mode_upsampling: int = 1
    dtype: jnp.dtype = jnp.float32
    s2d_out: bool = False          # mode 0 only: emit the s2d-layout output
    s2d_in: bool = False           # input arrives in s2d layout

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        if self.s2d_in:
            x = depth_to_space_3d(x)
        if self.mode_upsampling == 0:
            if self.s2d_out:
                x = _S2dDeconv(self.out_channels, self.dtype,
                               name="ConvTranspose_0")(x)
                norm = _norm(self.normalization, train, self.dtype)
                if norm is not None:
                    x = _norm_maybe_s2d(norm, x, True)
                return nn.relu(x)
            x = nn.ConvTranspose(self.out_channels, (2, 2, 2), strides=(2, 2, 2),
                                 dtype=self.dtype)(x)
        elif self.mode_upsampling == 1:
            x = upsample2x_trilinear(x)
            x = nn.Conv(self.out_channels, (3, 3, 3), padding=1, dtype=self.dtype)(x)
        elif self.mode_upsampling == 2:
            x = upsample2x_nearest(x, (1, 2, 3))
            x = nn.Conv(self.out_channels, (3, 3, 3), padding=1, dtype=self.dtype)(x)
        norm = _norm(self.normalization, train, self.dtype)
        if norm is not None:
            x = norm(x)
        return nn.relu(x)


class VEncoder(nn.Module):
    """5-scale strided-conv encoder, stages (1,2,3,3,3), channels x(1,2,4,8,16)
    with bottleneck channel-dropout 0.5 (vnet.py:127-168)."""
    n_filters: int = 16
    normalization: str = "none"
    has_dropout: bool = False
    has_residual: bool = False
    dtype: jnp.dtype = jnp.float32
    s2d_stem: bool = False
    s2d_stage2: bool = False
    zpack_stage2: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> List[jnp.ndarray]:
        block = ResidualConvBlock3d if self.has_residual else ConvBlock3d
        nf = self.n_filters
        # TPU fast path: run the full-resolution stage in space-to-depth
        # layout (exact — ops/s2d.py). The x1 skip is returned in s2d form
        # (8*nf channels); VDecoder detects and handles it.
        use_s2d = (self.s2d_stem and not self.has_residual
                   and all(d % 2 == 0 for d in x.shape[1:4]))
        # stage-2 s2d residency: block_two runs as k4-stride2 fused convs
        # (the 2*nf=32-channel stage is output-lane-bound; see _S2dFusedConv)
        # and two_dw collapses to a pointwise conv. The x2 skip is returned
        # in s2d form (16*nf channels); VDecoder detects and handles it.
        use_s2d2 = (self.s2d_stage2 and not self.has_residual
                    and all(d % 4 == 0 for d in x.shape[1:4]))
        if use_s2d:
            x1 = block(1, nf, self.normalization, self.dtype, s2d=True,
                       name="block_one")(space_to_depth_3d(x), train=train)
            d1 = DownBlock3d(2 * nf, self.normalization, self.dtype, s2d_in=True,
                             name="block_one_dw")(x1, train=train)
        else:
            x1 = block(1, nf, self.normalization, self.dtype, name="block_one")(x, train=train)
            d1 = DownBlock3d(2 * nf, self.normalization, self.dtype, name="block_one_dw")(x1, train=train)
        use_zpack = (self.zpack_stage2 and not use_s2d2
                     and not self.has_residual)
        x2 = block(2, 2 * nf, self.normalization, self.dtype,
                   **({"s2d_fused": True} if use_s2d2 else
                      {"zpack": True} if use_zpack else {}),
                   name="block_two")(d1, train=train)
        d2 = DownBlock3d(4 * nf, self.normalization, self.dtype, s2d_in=use_s2d2,
                         name="block_two_dw")(x2, train=train)
        x3 = block(3, 4 * nf, self.normalization, self.dtype, name="block_three")(d2, train=train)
        d3 = DownBlock3d(8 * nf, self.normalization, self.dtype, name="block_three_dw")(x3, train=train)
        x4 = block(3, 8 * nf, self.normalization, self.dtype, name="block_four")(d3, train=train)
        d4 = DownBlock3d(16 * nf, self.normalization, self.dtype, name="block_four_dw")(x4, train=train)
        x5 = block(3, 16 * nf, self.normalization, self.dtype, name="block_five")(d4, train=train)
        if self.has_dropout and train:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 0.5, x5.shape).astype(x5.dtype)
            x5 = x5 * keep / 0.5
        return [x1, x2, x3, x4, x5]


class VDecoder(nn.Module):
    """Additive-skip decoder, stages (3,3,3,2,1), 1x1x1 out conv
    (vnet.py:170-223)."""
    num_classes: int
    n_filters: int = 16
    normalization: str = "none"
    has_dropout: bool = False
    has_residual: bool = False
    up_type: int = 0
    dtype: jnp.dtype = jnp.float32
    zpack_stage2: bool = False

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], *, train: bool) -> jnp.ndarray:
        block = ResidualConvBlock3d if self.has_residual else ConvBlock3d
        nf = self.n_filters
        x1, x2, x3, x4, x5 = features
        # x1 arrives in s2d layout (8*nf channels) when the encoder ran the
        # s2d stem, x2 in s2d layout (16*nf channels) under stage-2 s2d
        # residency. The deconv decoder (up_type 0) keeps those stages in
        # s2d space; the interpolating decoders fall back via depth_to_space.
        x1_s2d = x1.shape[-1] == 8 * nf
        tail_s2d = x1_s2d and self.up_type == 0
        if x1_s2d and not tail_s2d:
            x1 = depth_to_space_3d(x1)
        x2_s2d = x2.shape[-1] == 16 * nf
        stage2_s2d = x2_s2d and self.up_type == 0
        if x2_s2d and not stage2_s2d:
            x2 = depth_to_space_3d(x2)
        x = UpBlock3d(8 * nf, self.normalization, self.up_type, self.dtype,
                      name="block_five_up")(x5, train=train) + x4
        x = block(3, 8 * nf, self.normalization, self.dtype, name="block_six")(x, train=train)
        x = UpBlock3d(4 * nf, self.normalization, self.up_type, self.dtype,
                      name="block_six_up")(x, train=train) + x3
        x = block(3, 4 * nf, self.normalization, self.dtype, name="block_seven")(x, train=train)
        x = UpBlock3d(2 * nf, self.normalization, self.up_type, self.dtype,
                      s2d_out=stage2_s2d, name="block_seven_up")(x, train=train) + x2
        x = block(2, 2 * nf, self.normalization, self.dtype,
                  **({"s2d_fused": True, "s2d_in": True} if stage2_s2d else
                     {"zpack": True} if (self.zpack_stage2
                                         and not self.has_residual) else {}),
                  name="block_eight")(x, train=train)
        x = UpBlock3d(nf, self.normalization, self.up_type, self.dtype,
                      s2d_out=tail_s2d, s2d_in=stage2_s2d,
                      name="block_eight_up")(x, train=train) + x1
        x = block(1, nf, self.normalization, self.dtype, s2d=tail_s2d,
                  name="block_nine")(x, train=train)
        if self.has_dropout and train:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 0.5, x.shape).astype(x.dtype)
            x = x * keep / 0.5
        if tail_s2d:
            out = _S2dPointwise(self.num_classes, self.dtype, name="out_conv")(x)
            return depth_to_space_3d(out)
        return nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype, name="out_conv")(x)


class VDecoderDS(nn.Module):
    """Deep-supervision decoder (vnet.py Decoder_ds:241-300): same additive-
    skip structure as VDecoder but returns (out_seg, stage_feats) where
    stage_feats = [x5, x6, x7, x8] — the bottleneck plus the three coarsest
    decoder stages — for SideConv deep-supervision heads."""
    num_classes: int
    n_filters: int = 16
    normalization: str = "none"
    has_dropout: bool = False
    has_residual: bool = False
    up_type: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], *, train: bool):
        block = ResidualConvBlock3d if self.has_residual else ConvBlock3d
        nf = self.n_filters
        x1, x2, x3, x4, x5 = features
        if x1.shape[-1] == 8 * nf:     # s2d-stem skip: no s2d tail here —
            x1 = depth_to_space_3d(x1)  # the ds decoder exposes plain feats
        if x2.shape[-1] == 16 * nf:    # stage-2 s2d skip: same fallback
            x2 = depth_to_space_3d(x2)
        stage_feats = [x5]
        x = UpBlock3d(8 * nf, self.normalization, self.up_type, self.dtype,
                      name="block_five_up")(x5, train=train) + x4
        x = block(3, 8 * nf, self.normalization, self.dtype, name="block_six")(x, train=train)
        stage_feats.append(x)
        x = UpBlock3d(4 * nf, self.normalization, self.up_type, self.dtype,
                      name="block_six_up")(x, train=train) + x3
        x = block(3, 4 * nf, self.normalization, self.dtype, name="block_seven")(x, train=train)
        stage_feats.append(x)
        x = UpBlock3d(2 * nf, self.normalization, self.up_type, self.dtype,
                      name="block_seven_up")(x, train=train) + x2
        x = block(2, 2 * nf, self.normalization, self.dtype, name="block_eight")(x, train=train)
        stage_feats.append(x)
        x = UpBlock3d(nf, self.normalization, self.up_type, self.dtype,
                      name="block_eight_up")(x, train=train) + x1
        x = block(1, nf, self.normalization, self.dtype, name="block_nine")(x, train=train)
        if self.has_dropout and train:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 0.5, x.shape).astype(x.dtype)
            x = x * keep / 0.5
        out = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                      name="out_conv")(x)
        return out, stage_feats


class SideConv3d(nn.Module):
    """Deep-supervision side heads (vnet.py SideConv:317-336): 1x1x1 class
    projections of Decoder_ds's stage feats at their NATIVE resolutions —
    the reference defines (but never applies) an upsample member, so the
    heads emit [x5, x6, x7, x8]-resolution logits at channel widths
    (16,8,4,2)*n_filters."""
    num_classes: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, stage_feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        names = ("side5", "side4", "side3", "side2")
        return [nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                        name=n)(f) for n, f in zip(names, stage_feats)]


class VNetDS(nn.Module):
    """Deep-supervised VNet: VEncoder + Decoder_ds + SideConv heads — the
    composition the reference's deep-supervised 3D SSL variants build from
    vnet.py:241-336 (the snapshot ships the classes but no composed model;
    this pairs with unet_3D_dv_semi the way Decoder_ds pairs with VNet).
    Returns (out_seg, [side5, side4, side3, side2])."""
    num_classes: int = 2
    n_filters: int = 16
    normalization: str = "none"
    has_dropout: bool = False
    has_residual: bool = False
    up_type: int = 0
    dtype: jnp.dtype = jnp.float32
    s2d_stem: bool = True
    s2d_stage2: bool = False
    zpack_stage2: bool = False

    def setup(self):
        self.encoder = VEncoder(self.n_filters, self.normalization,
                                self.has_dropout, self.has_residual, self.dtype,
                                self.s2d_stem, self.s2d_stage2,
                                self.zpack_stage2)
        self.decoder = VDecoderDS(self.num_classes, self.n_filters,
                                  self.normalization, self.has_dropout,
                                  self.has_residual, self.up_type, self.dtype)
        self.side = SideConv3d(self.num_classes, self.dtype)

    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        out, stage_feats = self.decoder(self.encoder(x, train=train), train=train)
        return out, self.side(stage_feats)


class VNet(nn.Module):
    """Single-decoder VNet, deconv decoder (vnet.py:303-315). s2d_stem runs
    the full-resolution stage in space-to-depth layout (exact; TPU fast
    path — ops/s2d.py)."""
    num_classes: int = 2
    n_filters: int = 16
    normalization: str = "none"
    has_dropout: bool = False
    has_residual: bool = False
    dtype: jnp.dtype = jnp.float32
    s2d_stem: bool = True
    s2d_stage2: bool = False
    zpack_stage2: bool = False

    def setup(self):
        self.encoder = VEncoder(self.n_filters, self.normalization,
                                self.has_dropout, self.has_residual, self.dtype,
                                self.s2d_stem, self.s2d_stage2,
                                self.zpack_stage2)
        self.decoder = VDecoder(self.num_classes, self.n_filters, self.normalization,
                                self.has_dropout, self.has_residual, 0, self.dtype,
                                self.zpack_stage2)

    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return self.decoder(self.encoder(x, train=train), train=train)


class DualDecoder3d(nn.Module):
    """Shared encoder, decoder1 trilinear / decoder2 deconv (vnet.py:225-238).

    Extended forward mirrors the 2D CHAP model (unet.py:277-292 semantics):
    with ``dropout_level`` given, the encoder pyramid is split into two
    channel-perturbed copies (chap_tpu.models.perturb, rank-generic over
    [B,D,H,W,C]) before the two decodes. Needs rng collection 'perturb' in
    that mode. When the s2d stem is active, the full-resolution skip x1 is
    perturbed through its [...,8,C] phase view so masks/scores act on
    ORIGINAL channels, identically to the plain layout.
    """
    num_classes: int = 2
    n_filters: int = 16
    normalization: str = "none"
    has_dropout: bool = False
    has_residual: bool = False
    dtype: jnp.dtype = jnp.float32
    s2d_stem: bool = True
    s2d_stage2: bool = False
    zpack_stage2: bool = False

    def setup(self):
        self.encoder = VEncoder(self.n_filters, self.normalization,
                                self.has_dropout, self.has_residual, self.dtype,
                                self.s2d_stem, self.s2d_stage2,
                                self.zpack_stage2)
        self.decoder1 = VDecoder(self.num_classes, self.n_filters, self.normalization,
                                 self.has_dropout, self.has_residual, 1, self.dtype,
                                 self.zpack_stage2)
        self.decoder2 = VDecoder(self.num_classes, self.n_filters, self.normalization,
                                 self.has_dropout, self.has_residual, 0, self.dtype,
                                 self.zpack_stage2)

    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 dropout_level=None, scores=None, comp_dropout: bool = False,
                 perturb_gate=None):
        features = self.encoder(x, train=train)
        if dropout_level is None:
            return (self.decoder1(features, train=train),
                    self.decoder2(features, train=train))

        from chap_tpu.models.perturb import perform_dropout
        from chap_tpu.ops.s2d import phase_view

        # s2d-layout skips (x1 under the stem, x2 under stage-2 residency)
        # are perturbed through their [...,8,C] phase views so masks/scores
        # act on ORIGINAL channels, identically to the plain layout.
        s2d_widths = (8 * self.n_filters, 16 * self.n_filters)
        features = list(features)
        is_s2d = [features[i].shape[-1] == s2d_widths[i] if i < 2 else False
                  for i in range(len(features))]
        for i, s in enumerate(is_s2d):
            if s:
                features[i] = phase_view(features[i])
        rng = self.make_rng("perturb")
        f1, f2 = perform_dropout(rng, features, dropout_level, scores,
                                 comp_dropout, gate=perturb_gate)
        for i, s in enumerate(is_s2d):
            if s:
                f1[i] = f1[i].reshape(f1[i].shape[:-2] + (s2d_widths[i],))
                f2[i] = f2[i].reshape(f2[i].shape[:-2] + (s2d_widths[i],))
        return self.decoder1(f1, train=train), self.decoder2(f2, train=train)
