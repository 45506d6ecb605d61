"""Dice-family losses (pure JAX, NHWC/N[D]HWC layouts, class axis last).

Rebuild of the missing ``utils.losses`` dice contracts (SURVEY.md §2.4):
  - DiceLoss(n_classes)             -> :func:`dice_loss`
  - DiceLoss_bcp (masked dice)      -> :func:`dice_loss_bcp`
    (call sites train_ours_2D.py:197,206-207)
  - softDiceLoss (prob-vs-prob)     -> :func:`soft_dice_loss_masked`
    (call sites train_share_encoder_2D.py:198,253-254)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Integer label map [...,] -> one-hot [..., C] float32."""
    return (labels[..., None] == jnp.arange(num_classes)).astype(jnp.float32)


def dice_loss(probs: jnp.ndarray, labels: jnp.ndarray, num_classes: int,
              smooth: float = 1e-5) -> jnp.ndarray:
    """Mean (over classes) of 1 - 2*<p,t> / (|p|^2 + |t|^2).

    probs: [..., C] softmax probabilities. labels: integer map [...].
    """
    target = one_hot(labels, num_classes)
    axes = tuple(range(probs.ndim - 1))
    intersect = jnp.sum(probs * target, axis=axes)
    y_sum = jnp.sum(target * target, axis=axes)
    z_sum = jnp.sum(probs * probs, axis=axes)
    loss = 1.0 - (2.0 * intersect + smooth) / (z_sum + y_sum + smooth)
    return jnp.mean(loss)


def dice_loss_bcp(probs: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray,
                  num_classes: int, smooth: float = 1e-10) -> jnp.ndarray:
    """Masked dice: sums restricted to mask==1 pixels (BCP mixing loss).

    probs: [..., C], labels: integer map [...], mask: {0,1} map [...].
    """
    target = one_hot(labels, num_classes)
    m = mask.astype(jnp.float32)[..., None]
    axes = tuple(range(probs.ndim - 1))
    intersect = jnp.sum(probs * target * m, axis=axes)
    y_sum = jnp.sum(target * target * m, axis=axes)
    z_sum = jnp.sum(probs * probs * m, axis=axes)
    loss = 1.0 - (2.0 * intersect + smooth) / (z_sum + y_sum + smooth)
    return jnp.mean(loss)


def dice_ce_supervised(logits: jnp.ndarray, labels: jnp.ndarray,
                       num_classes: int, fused: bool | None = None) -> jnp.ndarray:
    """The reference's supervised arm 0.5*(CE + Dice)
    (train_share_encoder_2D.py:322-327 et al.).

    On TPU this routes through the fused Pallas kernel: the naive composition
    materializes class-last [..., C] intermediates that XLA lays out with the
    tiny class dim in the 128-wide lane dimension (32x padded memory traffic —
    measured ~600x slower at batch 24x256x256).
    """
    import jax as _jax
    if fused is None:
        fused = _jax.default_backend() == "tpu"
    if fused:
        from chap_tpu.ops.fused_losses import fused_masked_dice_ce
        ones = jnp.ones(labels.shape, jnp.float32)
        dice, ce = fused_masked_dice_ce(logits, labels, ones,
                                        smooth_dice=1e-5)
        return 0.5 * (ce + dice)
    probs = jax.nn.softmax(logits, axis=-1)
    from chap_tpu.losses.ce import cross_entropy
    return 0.5 * (cross_entropy(logits, labels)
                  + dice_loss(probs, labels, num_classes))


def soft_dice_loss_masked(probs1: jnp.ndarray, probs2: jnp.ndarray,
                          mask: jnp.ndarray, smooth: float = 1e-5) -> jnp.ndarray:
    """Dice between two soft probability maps, restricted to mask==1.

    Used as the decoder-discrepancy measure in the ACAL min-max game
    (train_share_encoder_2D.py:253-254). probs*: [..., C]; mask: bool map.
    """
    m = mask.astype(jnp.float32)[..., None]
    axes = tuple(range(probs1.ndim - 1))
    intersect = jnp.sum(probs1 * probs2 * m, axis=axes)
    s1 = jnp.sum(probs1 * probs1 * m, axis=axes)
    s2 = jnp.sum(probs2 * probs2 * m, axis=axes)
    loss = 1.0 - (2.0 * intersect + smooth) / (s1 + s2 + smooth)
    return jnp.mean(loss)
