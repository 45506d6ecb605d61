"""Dual-student network with proxy cross-attention and CLUB mutual-information
disentanglement (reference unet.py:623-757 DSNet, cross_attention.py:305-378
MyCrossAttention, club.py:4-68 CLUBMean/MIEstimator).

Two independent UNet students; in train mode their decoder features are
projected, attended by shared+independent proxy queries, and a distance loss
(CLUB MI upper bound between the two students' independent features + its
learning loss) is returned alongside both logits.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from chap_tpu.models.unet2d import UNet


class FFN(nn.Module):
    dim: int
    hidden: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        h = nn.Dense(self.hidden, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return x + h


class MyCrossAttention(nn.Module):
    """Proxy queries attend over projected feature tokens; returns
    (updated queries, head-mean attention scores)."""
    dim: int
    num_heads: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, parts: jnp.ndarray, supp_feat: jnp.ndarray,
                 *, train: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b = supp_feat.shape[0]
        n, c = parts.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        q_ori = jnp.broadcast_to(parts[None], (b, n, c))

        def split_heads(t):
            return t.reshape(b, t.shape[1], self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = split_heads(nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="q_fc")(q_ori))
        k = split_heads(nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="k_fc")(supp_feat))
        v = split_heads(nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="v_fc")(supp_feat))

        attn = jnp.einsum("bhqc,bhsc->bhqs", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(0.1, deterministic=not train)(attn)
        x = jnp.einsum("bhqs,bhsc->bhqc", attn, v).transpose(0, 2, 1, 3).reshape(b, n, c)
        x = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="proj")(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = x + q_ori
        x = FFN(self.dim, 3 * self.dim, dtype=self.dtype)(x, train=train)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return x, attn.mean(axis=1)


class CLUBMean(nn.Module):
    """Contrastive log-ratio upper bound of MI, unit-variance q(y|x)."""
    y_dim: int
    hidden: int = 512
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.fc1 = nn.Dense(self.hidden, dtype=self.dtype)
        self.fc2 = nn.Dense(self.y_dim, dtype=self.dtype)

    def mu(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.fc2(nn.relu(self.fc1(x)))

    def __call__(self, x_samples: jnp.ndarray, y_samples: jnp.ndarray) -> jnp.ndarray:
        mu = self.mu(x_samples)
        positive = -((mu - y_samples) ** 2) / 2.0
        negative = -jnp.mean((y_samples[None, :, :] - mu[:, None, :]) ** 2, axis=1) / 2.0
        return jnp.mean(positive.sum(-1) - negative.sum(-1))

    def learning_loss(self, x_samples: jnp.ndarray, y_samples: jnp.ndarray) -> jnp.ndarray:
        mu = self.mu(x_samples)
        return jnp.mean(jnp.sum((mu - y_samples) ** 2, axis=1))


class DSNet(nn.Module):
    """DSNet equivalent: train mode -> (logits1, logits2, dist_loss);
    eval -> (logits1, logits2)."""
    num_classes: int
    project_dim: int = 64
    multiscale: bool = False
    proxy_num: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.student1 = UNet(self.num_classes, dtype=self.dtype)
        self.student2 = UNet(self.num_classes, dtype=self.dtype)
        self.att1 = MyCrossAttention(self.project_dim, 2, self.dtype)
        self.att2 = MyCrossAttention(self.project_dim, 2, self.dtype)
        self.shared_proxy = self.param(
            "shared_proxy", nn.initializers.uniform(1.0),
            (self.proxy_num, self.project_dim))
        self.independent_proxy1 = self.param(
            "independent_proxy1", nn.initializers.uniform(1.0),
            (self.proxy_num, self.project_dim))
        self.independent_proxy2 = self.param(
            "independent_proxy2", nn.initializers.uniform(1.0),
            (self.proxy_num, self.project_dim))
        self.club = CLUBMean(self.project_dim, dtype=self.dtype)
        self.projector1 = ProjectorHead(self.project_dim, self.multiscale, self.dtype)
        self.projector2 = ProjectorHead(self.project_dim, self.multiscale, self.dtype)

    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        out1, f1 = self.student1(x, train=train, with_feats=True)
        out2, f2 = self.student2(x, train=train, with_feats=True)
        if not train:
            return out1, out2

        kv1 = self.projector1(f1, train=train)         # [B,L,C]
        kv2 = self.projector2(f2, train=train)
        q1 = jnp.concatenate([self.shared_proxy, self.independent_proxy1])
        q2 = jnp.concatenate([self.shared_proxy, self.independent_proxy2])
        out_q1, _ = self.att1(q1, kv1, train=train)
        out_q2, _ = self.att2(q2, kv2, train=train)
        dist = self._dist_loss(out_q1, out_q2)
        return out1, out2, dist

    def _dist_loss(self, q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
        """Group-merge queries into (common, distinct) embeddings and penalize
        MI between the two students' distinct halves (unet.py:724-757)."""
        g = q1.shape[1] // 2
        common1, dist1 = q1[:, :g].mean(1), q1[:, g:].mean(1)
        common2, dist2 = q2[:, :g].mean(1), q2[:, g:].mean(1)
        mimin = self.club(dist1, dist2)
        mimin_loss = self.club.learning_loss(dist1, dist2)
        del common1, common2  # alignment term commented out in the reference
        return mimin_loss + mimin


class ProjectorHead(nn.Module):
    """avgpool4 (single-scale) + 1x1-conv BN ReLU 1x1-conv projector
    (unet.py:644-675), flattened to [B, L, C] tokens."""
    project_dim: int
    multiscale: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f, *, train: bool) -> jnp.ndarray:
        x = f  # final decoder feature [B,H,W,16]
        if not self.multiscale:
            x = nn.avg_pool(x, (4, 4), strides=(4, 4))
        h = nn.Conv(self.project_dim, (1, 1), dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.project_dim, (1, 1), dtype=self.dtype)(h)
        b, hh, ww, c = h.shape
        return h.reshape(b, hh * ww, c)
