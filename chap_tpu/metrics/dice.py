"""Pure-JAX dice metrics (device-side, jittable).

Used for in-step training signals; the host-side medpy-parity metrics live in
chap_tpu.metrics.surface.
"""
from __future__ import annotations

import jax.numpy as jnp


def soft_dice(probs: jnp.ndarray, onehot: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Soft dice score per class, averaged. probs/onehot: [..., C]."""
    axes = tuple(range(probs.ndim - 1))
    inter = jnp.sum(probs * onehot, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(onehot, axis=axes)
    return jnp.mean((2.0 * inter + eps) / (denom + eps))


def hard_dice(pred: jnp.ndarray, gt: jnp.ndarray, num_classes: int, eps: float = 1e-6) -> jnp.ndarray:
    """Per-foreground-class hard dice. pred/gt: integer label maps.

    Returns [num_classes - 1] vector (classes 1..C-1), 2|A∩B|/(|A|+|B|).
    """
    scores = []
    for c in range(1, num_classes):
        p = (pred == c).astype(jnp.float32)
        g = (gt == c).astype(jnp.float32)
        inter = jnp.sum(p * g)
        scores.append((2.0 * inter) / (jnp.sum(p) + jnp.sum(g) + eps))
    return jnp.stack(scores)
