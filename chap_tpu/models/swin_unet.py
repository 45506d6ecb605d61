"""SwinUNet — Swin Transformer encoder-decoder with skip connections and
patch-expand upsampling (reference vision_transformer.py:24-121 over
swin_transformer_unet_skip_expand_decoder_sys.py:63-817).

Flax rebuild with the full Swin machinery: windowed MSA with relative position
bias, shifted windows (roll + attention mask), patch merging down / linear
patch expand up, skip concat+reduce, and the final 4x expand head. Token
layout [B, L, C] with static H/W threaded through (XLA-friendly reshapes, no
dynamic shapes).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """[B,H,W,C] -> [B*nW, ws*ws, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """[B*nW, ws*ws, C] -> [B,H,W,C]."""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // ws // ws)
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (swin...sys.py:63-167)."""
    dim: int
    window_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray], *,
                 train: bool) -> jnp.ndarray:
        b_, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhnc,bhmc->bhnm", q, k)

        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads))
        idx = _relative_position_index(self.window_size)
        bias = rpb_table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n) \
                + mask[None, :, None]
            attn = attn.reshape(-1, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmc->bhnc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x)
        return nn.Dense(self.out, dtype=self.dtype)(x)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> jnp.ndarray:
    """Attention mask for shifted windows (swin...sys.py:210-226)."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    mask_windows = np.asarray(window_partition(jnp.asarray(img_mask), ws))[..., 0]
    diff = mask_windows[:, None, :] - mask_windows[:, :, None]
    return jnp.asarray(np.where(diff != 0, -100.0, 0.0).astype(np.float32))


class SwinBlock(nn.Module):
    """Swin block: (S)W-MSA + MLP with pre-LN (swin...sys.py:169-307)."""
    dim: int
    num_heads: int
    resolution: Tuple[int, int]
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        h, w = self.resolution
        ws, shift = self.window_size, self.shift_size
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0
        b, l, c = x.shape

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x).reshape(b, h, w, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = _shift_attn_mask(h, w, ws, shift)
        else:
            mask = None
        windows = window_partition(x, ws)
        attn = WindowAttention(self.dim, ws, self.num_heads, self.dtype)(
            windows, mask, train=train)
        x = window_reverse(attn, ws, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x.reshape(b, l, c)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dtype)(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x), train=train)
        return x


class PatchMerging(nn.Module):
    """2x2 token merge + linear reduce to 2C (swin...sys.py:309-341)."""
    dim: int
    resolution: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.resolution
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = x.reshape(b, (h // 2) * (w // 2), 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype)(x)


class PatchExpand(nn.Module):
    """Linear 2x expand + pixel-shuffle rearrange (swin...sys.py:343-372)."""
    dim: int
    resolution: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.resolution
        b, l, c = x.shape
        x = nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype)(x)
        c2 = 2 * self.dim
        x = x.reshape(b, h, w, 2, 2, c2 // 4)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h * 2 * w, c2 // 4)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)


class FinalPatchExpandX4(nn.Module):
    """4x expand head (swin...sys.py:374-411)."""
    dim: int
    resolution: Tuple[int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.resolution
        b, l, c = x.shape
        x = nn.Dense(16 * self.dim, use_bias=False, dtype=self.dtype)(x)
        x = x.reshape(b, h, w, 4, 4, self.dim)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 4 * h * 4 * w, self.dim)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)


class SwinDecoder(nn.Module):
    """Decoder-only Swin (SwinTransformer_Decoder,
    swin_..._original.py:807-1036, imported at vision_transformer.py:21):
    a 5-level CNN feature pyramid (channels ``in_chans``, e.g. a UNet
    encoder's [16,32,64,128,256]) is patch-embedded per level with stride-2
    convs to dims embed_dim*(1,2,4,8,16) (Features_PatchEmbed :1039-1095),
    the deepest level seeds a Swin decoder whose stages PatchExpand 2x,
    concat the matching level's embedding, linear-reduce, and run Swin
    blocks; a final 2x expand (dim_scale=2, :928-931) returns full
    resolution. Returns NHWC logits; ``with_features`` adds the projector
    head output (:936-941). The reference also constructs a full Swin
    ENCODER it never calls in forward (:875-892) — dead weight, not rebuilt.
    """
    num_classes: int = 4
    img_size: int = 224
    embed_dim: int = 48
    patch_size: int = 2
    depths: Sequence[int] = (2, 2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24, 24)
    window_size: int = 7
    projection_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], *,
                 train: bool = False, with_features: bool = False):
        num_layers = len(self.depths)
        if len(features) != num_layers:
            raise ValueError(f"need {num_layers} pyramid levels, got "
                             f"{len(features)}")
        b = features[0].shape[0]

        # Features_PatchEmbed: per-level stride-2 conv to embed_dim * 2**i
        embeds, ress = [], []
        for i, f in enumerate(features):
            dim_i = self.embed_dim * 2 ** i
            t = nn.Conv(dim_i, (self.patch_size, self.patch_size),
                        strides=self.patch_size, dtype=self.dtype,
                        name=f"patch_proj{i}")(f)
            h = t.shape[1]
            t = t.reshape(b, h * t.shape[2], dim_i)
            t = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"patch_norm{i}")(t)
            embeds.append(t)
            ress.append(h)

        x = embeds[-1]
        res, dim = ress[-1], self.embed_dim * 2 ** (num_layers - 1)
        x = PatchExpand(dim, (res, res), self.dtype, name="expand0")(x)
        res, dim = res * 2, dim // 2
        for inx in range(1, num_layers):
            lvl = num_layers - 1 - inx
            x = jnp.concatenate([x, embeds[lvl]], axis=-1)
            x = nn.Dense(dim, dtype=self.dtype, name=f"concat_back{inx}")(x)
            for d in range(self.depths[lvl]):
                x = SwinBlock(dim, self.num_heads[lvl], (res, res),
                              self.window_size,
                              0 if d % 2 == 0 else self.window_size // 2,
                              dtype=self.dtype,
                              name=f"up{inx}_blk{d}")(x, train=train)
            if inx < num_layers - 1:
                x = PatchExpand(dim, (res, res), self.dtype,
                                name=f"expand{inx}")(x)
                res, dim = res * 2, dim // 2
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_up")(x)

        # final expand: dim_scale = patch_size (2) back to input resolution
        s = self.patch_size
        x = nn.Dense(s * s * dim, use_bias=False, dtype=self.dtype,
                     name="final_expand")(x)
        x = x.reshape(b, res, res, s, s, dim)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, res * s * res * s, dim)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_norm")(x)
        x = x.reshape(b, res * s, res * s, dim)

        logits = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                         dtype=self.dtype, name="output")(x)
        if not with_features:
            return logits
        p = nn.Conv(self.projection_dim, (1, 1), dtype=self.dtype,
                    name="proj1")(x)
        p = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="proj_bn")(p)
        p = nn.relu(p)
        p = nn.Conv(self.projection_dim, (1, 1), dtype=self.dtype,
                    name="proj2")(p)
        return logits, p


class SwinUNet(nn.Module):
    """SwinTransformerSys + SwinUnet wrapper: single-channel inputs are
    repeated to 3 channels (vision_transformer.py:50-51); returns NHWC logits.
    img_size must be divisible by patch_size * 2**(len(depths)-1)."""
    num_classes: int
    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        b = x.shape[0]
        res0 = self.img_size // self.patch_size

        # patch embed
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=self.patch_size, dtype=self.dtype, name="patch_embed")(x)
        x = x.reshape(b, res0 * res0, self.embed_dim)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)

        num_layers = len(self.depths)
        skips = []
        res = res0
        dim = self.embed_dim
        # encoder — skips are the INPUTS to each BasicLayer, i.e. collected
        # BEFORE the layer's blocks run (swin...sys.py:762-763 appends x to
        # x_downsample before `x = layer(x)`)
        for i, depth in enumerate(self.depths):
            skips.append((x, res, dim))
            for d in range(depth):
                x = SwinBlock(dim, self.num_heads[i], (res, res),
                              self.window_size,
                              0 if d % 2 == 0 else self.window_size // 2,
                              dtype=self.dtype, name=f"enc{i}_blk{d}")(x, train=train)
            if i < num_layers - 1:
                x = PatchMerging(dim, (res, res), self.dtype, name=f"merge{i}")(x)
                res //= 2
                dim *= 2
        # bottleneck norm (swin...sys.py:766 `x = self.norm(x)`)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)

        # decoder
        for i in range(num_layers - 1):
            x = PatchExpand(dim, (res, res), self.dtype, name=f"expand{i}")(x)
            res *= 2
            dim //= 2
            skip, _, _ = skips[num_layers - 2 - i]
            x = jnp.concatenate([x, skip], axis=-1)
            # concat_back_dim is a biased Linear (swin...sys.py:690-691)
            x = nn.Dense(dim, dtype=self.dtype, name=f"skip_reduce{i}")(x)
            depth = self.depths[num_layers - 2 - i]
            for d in range(depth):
                x = SwinBlock(dim, self.num_heads[num_layers - 2 - i], (res, res),
                              self.window_size,
                              0 if d % 2 == 0 else self.window_size // 2,
                              dtype=self.dtype, name=f"dec{i}_blk{d}")(x, train=train)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_up")(x)
        x = FinalPatchExpandX4(dim, (res, res), self.dtype, name="up_x4")(x)
        x = x.reshape(b, res * 4, res * 4, dim)
        return nn.Conv(self.num_classes, (1, 1), use_bias=False,
                       dtype=self.dtype, name="output")(x)
