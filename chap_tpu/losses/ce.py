"""Cross-entropy / MSE primitives (pure JAX, class axis last)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_per_pixel(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel CE, no reduction. logits [..., C], labels integer [...].

    Matches torch F.cross_entropy(reduction='none') semantics
    (train_ours_2D.py:323-324).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE (torch CrossEntropyLoss default reduction)."""
    return jnp.mean(cross_entropy_per_pixel(logits, labels))


def masked_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                         mask: jnp.ndarray, eps: float = 1e-16) -> jnp.ndarray:
    """sum(CE * mask) / (sum(mask) + eps), matching mix_loss CE terms
    (train_ours_2D.py:208-209)."""
    ce = cross_entropy_per_pixel(logits, labels)
    m = mask.astype(ce.dtype)
    return jnp.sum(ce * m) / (jnp.sum(m) + eps)


def mse_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def mse_loss_noreduction(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return (a - b) ** 2


def kl_div_per_pixel(log_q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """KL(p || q) summed over the class axis, per pixel.

    Matches torch F.kl_div(log_q, p, reduction='none').sum(class axis):
    p * (log p - log q), with 0*log0 = 0.
    """
    safe_logp = jnp.where(p > 0, jnp.log(jnp.maximum(p, 1e-30)), 0.0)
    return jnp.sum(p * (safe_logp - log_q), axis=-1)
