"""Query-based transformer decoder whose cross-attention maps ARE the
segmentation maps (reference mask2former_transformer_decoder.py:215-461
MyTransformerDecoder, attention_op.py:20-171, position_encoding.py:12-64).

Learnable class queries attend over multi-level encoder features; at every
layer the per-query attention logits are projected by a seg head into a
segmentation map, and all per-layer maps are returned for deep supervision.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def position_embedding_sine(h: int, w: int, dim: int,
                            temperature: float = 10000.0) -> jnp.ndarray:
    """Sine/cosine 2D position encoding [H*W, dim] (position_encoding.py:12-64)."""
    half = dim // 2
    y = np.arange(1, h + 1, dtype=np.float32)[:, None].repeat(w, 1)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :].repeat(h, 0)
    eps = 1e-6
    y = y / (y[-1:, :] + eps) * 2 * np.pi
    x = x / (x[:, -1:] + eps) * 2 * np.pi
    dim_t = temperature ** (2 * (np.arange(half) // 2) / half)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])], -1).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])], -1).reshape(h, w, -1)
    return jnp.asarray(np.concatenate([pos_y, pos_x], -1).reshape(h * w, dim))


class CrossAttentionLayer(nn.Module):
    """Cross-attention returning (updated queries, attention logits)
    (attention_op.py:20-79 MyCrossAttentionLayer)."""
    dim: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt: jnp.ndarray, memory: jnp.ndarray,
                 query_pos: jnp.ndarray, pos: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, n, c = tgt.shape
        hd = self.dim // self.num_heads

        def heads(t):
            return t.reshape(b, t.shape[1], self.num_heads, hd).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(self.dim, dtype=self.dtype, name="q")(tgt + query_pos))
        k = heads(nn.Dense(self.dim, dtype=self.dtype, name="k")(memory + pos))
        v = heads(nn.Dense(self.dim, dtype=self.dtype, name="v")(memory))
        logits = jnp.einsum("bhnc,bhmc->bhnm", q, k) / jnp.sqrt(hd).astype(self.dtype)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhnm,bhmc->bhnc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        tgt = nn.LayerNorm(dtype=self.dtype)(tgt + out)
        # head-mean attention logits -> per-query spatial response map
        return tgt, logits.mean(axis=1)


class SelfAttentionLayer(nn.Module):
    dim: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt: jnp.ndarray, query_pos: jnp.ndarray) -> jnp.ndarray:
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim, dtype=self.dtype)(
            tgt + query_pos, tgt + query_pos, tgt)
        return nn.LayerNorm(dtype=self.dtype)(tgt + h)


class FFNLayer(nn.Module):
    dim: int
    hidden: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.hidden, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return nn.LayerNorm(dtype=self.dtype)(x + h)


class KMaxCrossAttentionLayer(nn.Module):
    """k-means cross-attention (MyKMaXTransformerDecoder, mask2former...py:
    715-938): pixels are hard-assigned to their argmax query (cluster
    assignment) and each query aggregates its cluster's features — the
    k-means update step — instead of softmax attention over pixels. The hard
    assignment uses a straight-through one-hot (gumbel-free): forward = one-hot
    argmax over the query axis, backward = softmax gradient."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt: jnp.ndarray, memory: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, n, c = tgt.shape
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(tgt)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(memory)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(memory)
        logits = jnp.einsum("bnc,bmc->bnm", q, k) / jnp.sqrt(self.dim).astype(self.dtype)
        # cluster assignment over the QUERY axis (axis=1), per pixel
        soft = jax.nn.softmax(logits, axis=1)
        hard = jax.nn.one_hot(jnp.argmax(logits, axis=1), n, axis=1,
                              dtype=soft.dtype)
        assign = soft + jax.lax.stop_gradient(hard - soft)   # straight-through
        pooled = jnp.einsum("bnm,bmc->bnc", assign, v)
        pooled = pooled / (jnp.sum(assign, axis=-1, keepdims=True) + 1e-6)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(pooled)
        tgt = nn.LayerNorm(dtype=self.dtype)(tgt + out)
        return tgt, logits


class MaskTransformerDecoder(nn.Module):
    """MyTransformerDecoder equivalent: queries cycle over `num_levels`
    feature scales for `num_layers` rounds; every cross-attn's attention map
    goes through a per-layer seg head producing [B, Q, H_l, W_l] maps.
    Input: list of NHWC feature maps (finest last). Returns
    (attn_segmaps, attn_maps) per layer."""
    num_queries: int = 4
    hidden_dim: int = 256
    num_layers: int = 9
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], *, train: bool = False):
        num_levels = len(features)
        b = features[0].shape[0]
        # project every level to hidden_dim tokens + its position encoding
        tokens, poss, hw = [], [], []
        for i, f in enumerate(features):
            _, h, w, _ = f.shape
            t = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                        name=f"input_proj{i}")(f).reshape(b, h * w, self.hidden_dim)
            lvl = self.param(f"level_embed{i}", nn.initializers.normal(0.02),
                             (1, 1, self.hidden_dim))
            tokens.append(t + lvl)
            poss.append(position_embedding_sine(h, w, self.hidden_dim)[None])
            hw.append((h, w))

        query_feat = self.param("query_feat", nn.initializers.normal(0.02),
                                (self.num_queries, self.hidden_dim))
        query_pos = self.param("query_embed", nn.initializers.normal(0.02),
                               (self.num_queries, self.hidden_dim))
        tgt = jnp.broadcast_to(query_feat[None], (b,) + query_feat.shape)
        qpos = jnp.broadcast_to(query_pos[None], (b,) + query_pos.shape)

        seg_maps: List[jnp.ndarray] = []
        attn_maps: List[jnp.ndarray] = []
        for layer in range(self.num_layers):
            lvl = layer % num_levels
            tgt, attn = CrossAttentionLayer(self.hidden_dim, self.num_heads,
                                            self.dtype, name=f"cross{layer}")(
                tgt, tokens[lvl], qpos, poss[lvl])
            tgt = SelfAttentionLayer(self.hidden_dim, self.num_heads,
                                     self.dtype, name=f"self{layer}")(tgt, qpos)
            tgt = FFNLayer(self.hidden_dim, dtype=self.dtype,
                           name=f"ffn{layer}")(tgt)
            h, w = hw[lvl]
            # per-layer seg head over the attention map (the "attention maps
            # become segmentation maps" trick, mask2former...py:393-399)
            seg = nn.Dense(1, dtype=self.dtype, name=f"seg_head{layer}")(
                attn[..., None])[..., 0]
            seg_maps.append(seg.reshape(b, self.num_queries, h, w))
            attn_maps.append(attn.reshape(b, self.num_queries, h, w))
        return seg_maps, attn_maps


class MlpHead(nn.Module):
    """3-layer ReLU MLP (mask2former...py MLP, used by mask_embed :590)."""
    hidden: int
    out: int
    num_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        return nn.Dense(self.out, dtype=self.dtype)(x)


class MaskTransformerDecoderV1(nn.Module):
    """MyTransformerDecoderV1 equivalent (mask2former...py:466-713) — the
    middle of the reference's three decoder variants. Differences from
    MaskTransformerDecoder:

      * cross-attention is SINGLE-head (MyCrossAttentionLayer nhead=1, :536)
      * layer i reads feature level i DIRECTLY (level_index = i, :635 — no
        modulo cycling), so num_layers must not exceed len(features)
      * each seg head maps the Q-channel attention map to ``num_classes``
        channels (Conv2d(num_queries, num_classes, 1), :561) instead of a
        per-query scalar head
      * mask2former-style prediction heads run once on the initial queries
        (:628-631): decoder_norm -> class_embed [B,Q,num_classes+1] and
        mask_embed MLP einsum'd with the pixel ``mask_features``
        -> outputs_mask [B,Q,H,W]

    Inputs: ``features`` — list of NHWC maps, one per layer; ``mask_features``
    — NHWC pixel features from the CNN decoder. Returns
    (attn_segmaps [B,num_classes,h_i,w_i] per layer, (outputs_class,
    outputs_mask)).
    """
    num_queries: int = 4
    num_classes: int = 4
    hidden_dim: int = 256
    num_layers: int = 4
    num_heads: int = 8          # self-attention heads; cross-attn is 1-head
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray],
                 mask_features: jnp.ndarray, *, train: bool = False):
        if self.num_layers > len(features):
            raise ValueError("MyTransformerDecoderV1 indexes feature level i "
                             "at layer i (mask2former...py:635); need "
                             f"{self.num_layers} levels, got {len(features)}")
        b = features[0].shape[0]
        tokens, poss, hw = [], [], []
        for i in range(self.num_layers):
            f = features[i]
            _, h, w, _ = f.shape
            t = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                        name=f"input_proj{i}")(f).reshape(b, h * w, self.hidden_dim)
            lvl = self.param(f"level_embed{i}", nn.initializers.normal(0.02),
                             (1, 1, self.hidden_dim))
            tokens.append(t + lvl)
            poss.append(position_embedding_sine(h, w, self.hidden_dim)[None])
            hw.append((h, w))

        query_feat = self.param("query_feat", nn.initializers.normal(0.02),
                                (self.num_queries, self.hidden_dim))
        query_pos = self.param("query_embed", nn.initializers.normal(0.02),
                               (self.num_queries, self.hidden_dim))
        tgt = jnp.broadcast_to(query_feat[None], (b,) + query_feat.shape)
        qpos = jnp.broadcast_to(query_pos[None], (b,) + query_pos.shape)

        # prediction heads on the learnable query features (:628-631)
        dec = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")(tgt)
        outputs_class = nn.Dense(self.num_classes + 1, dtype=self.dtype,
                                 name="class_embed")(dec)
        mask_embed = MlpHead(self.hidden_dim, mask_features.shape[-1],
                             dtype=self.dtype, name="mask_embed")(dec)
        outputs_mask = jnp.einsum("bqc,bhwc->bqhw", mask_embed, mask_features)

        seg_maps: List[jnp.ndarray] = []
        for layer in range(self.num_layers):
            tgt, attn = CrossAttentionLayer(self.hidden_dim, 1, self.dtype,
                                            name=f"cross{layer}")(
                tgt, tokens[layer], qpos, poss[layer])
            h, w = hw[layer]
            # seg head: queries -> classes over the attention map (:561,:649)
            seg = nn.Dense(self.num_classes, dtype=self.dtype,
                           name=f"seg_head{layer}")(
                jnp.swapaxes(attn, 1, 2))           # [B, hw, Q] -> [B, hw, C]
            seg_maps.append(jnp.swapaxes(seg, 1, 2).reshape(
                b, self.num_classes, h, w))
            tgt = SelfAttentionLayer(self.hidden_dim, self.num_heads,
                                     self.dtype, name=f"self{layer}")(tgt, qpos)
            tgt = FFNLayer(self.hidden_dim, dtype=self.dtype,
                           name=f"ffn{layer}")(tgt)
        return seg_maps, (outputs_class, outputs_mask)


class KMaxTransformerDecoder(nn.Module):
    """MyKMaXTransformerDecoder equivalent: same query/level cycling but with
    k-means cluster-assignment cross-attention; per-layer seg heads over the
    assignment logits."""
    num_queries: int = 4
    hidden_dim: int = 256
    num_layers: int = 6
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], *, train: bool = False):
        num_levels = len(features)
        b = features[0].shape[0]
        tokens, hw = [], []
        for i, f in enumerate(features):
            _, h, w, _ = f.shape
            t = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                        name=f"input_proj{i}")(f).reshape(b, h * w, self.hidden_dim)
            tokens.append(t + position_embedding_sine(h, w, self.hidden_dim)[None])
            hw.append((h, w))

        query_feat = self.param("query_feat", nn.initializers.normal(0.02),
                                (self.num_queries, self.hidden_dim))
        tgt = jnp.broadcast_to(query_feat[None], (b,) + query_feat.shape)
        qpos = jnp.zeros_like(tgt)

        seg_maps: List[jnp.ndarray] = []
        for layer in range(self.num_layers):
            lvl = layer % num_levels
            tgt, logits = KMaxCrossAttentionLayer(self.hidden_dim, self.dtype,
                                                  name=f"kmax{layer}")(tgt, tokens[lvl])
            tgt = SelfAttentionLayer(self.hidden_dim, self.num_heads,
                                     self.dtype, name=f"self{layer}")(tgt, qpos)
            tgt = FFNLayer(self.hidden_dim, dtype=self.dtype,
                           name=f"ffn{layer}")(tgt)
            h, w = hw[lvl]
            seg = nn.Dense(1, dtype=self.dtype, name=f"seg_head{layer}")(
                logits[..., None])[..., 0]
            seg_maps.append(seg.reshape(b, self.num_queries, h, w))
        return seg_maps
