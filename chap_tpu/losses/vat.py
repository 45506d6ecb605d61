"""Virtual adversarial training (VAT) for the dual-decoder model — the
"spatial" half of CHAP's channel-spatial perturbation.

Rebuild of the missing ``utils.losses.VAT2d`` contract (SURVEY.md §2.4; call
site train_ours_2D.py:290,372): power iteration finds the divergence-maximizing
input direction, then the adversarial divergence against BOTH decoders is
penalized, restricted to the top-k disagreement mask.

TPU-first design: the reference runs K eager forward+backward passes per step;
here the whole power iteration is expressed with ``jax.grad`` inside the jitted
train step, so XLA compiles forward+VJP into the same program — no Python
round-trips, no optimizer.zero_grad bookkeeping.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from chap_tpu.losses.ce import kl_div_per_pixel
from chap_tpu.losses.dice import soft_dice_loss_masked


def l2_normalize_batch(d: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Normalize each batch element's perturbation to unit L2 norm."""
    flat = d.reshape(d.shape[0], -1)
    norm = jnp.linalg.norm(flat, axis=1).reshape((-1,) + (1,) * (d.ndim - 1))
    return d / (norm + eps)


def _divergence(logits1: jnp.ndarray, logits2: jnp.ndarray,
                soft1: jnp.ndarray, soft2: jnp.ndarray,
                mask: jnp.ndarray, losstype: str) -> jnp.ndarray:
    """Masked divergence of perturbed predictions vs. the clean soft targets."""
    if losstype == "kl":
        logp1 = jax.nn.log_softmax(logits1, axis=-1)
        logp2 = jax.nn.log_softmax(logits2, axis=-1)
        kl1 = kl_div_per_pixel(logp1, soft1)
        kl2 = kl_div_per_pixel(logp2, soft2)
        m = mask.astype(kl1.dtype)
        denom = jnp.sum(m) + 1e-16
        return (jnp.sum(kl1 * m) + jnp.sum(kl2 * m)) / denom
    elif losstype == "dice":
        p1 = jax.nn.softmax(logits1, axis=-1)
        p2 = jax.nn.softmax(logits2, axis=-1)
        return (soft_dice_loss_masked(p1, soft1, mask)
                + soft_dice_loss_masked(p2, soft2, mask))
    raise ValueError(f"unknown adv_losstype {losstype!r}")


def vat_divergence(logits1: jnp.ndarray, logits2: jnp.ndarray,
                   soft1: jnp.ndarray, soft2: jnp.ndarray,
                   mask: jnp.ndarray, losstype: str) -> jnp.ndarray:
    """Public handle on the masked VAT divergence — used by the fused-pass
    CHAP step (train/step_chap.py), where the adversarial forward runs inside
    a batched apply and only the divergence is computed here."""
    return _divergence(logits1, logits2, soft1, soft2, mask, losstype)


def vat_direction(apply_fn: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
                  x: jnp.ndarray, soft1: jnp.ndarray, soft2: jnp.ndarray,
                  mask: jnp.ndarray, rng: jax.Array, xi: float = 10.0,
                  num_iters: int = 1, losstype: str = "kl") -> jnp.ndarray:
    """Power iteration only: returns the unit adversarial direction d (stop-
    gradient), without the final adversarial pass. The fused CHAP step runs
    the final pass batched with the student/dropout passes; this keeps the
    per-pass semantics of vat_loss_2d exactly (same d draws, same
    normalization) while letting the expensive final forward join the big
    batch."""
    soft1 = jax.lax.stop_gradient(soft1)
    soft2 = jax.lax.stop_gradient(soft2)
    d = jax.random.uniform(rng, x.shape, dtype=x.dtype) - 0.5
    d = l2_normalize_batch(d)

    def adv_distance(d_in: jnp.ndarray) -> jnp.ndarray:
        l1, l2 = apply_fn(x + xi * d_in)
        return _divergence(l1, l2, soft1, soft2, mask, losstype)

    for _ in range(num_iters):
        grad_d = jax.grad(adv_distance)(d)
        d = l2_normalize_batch(jax.lax.stop_gradient(grad_d))
    return d


def vat_loss_2d(apply_fn: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
                x: jnp.ndarray, soft1: jnp.ndarray, soft2: jnp.ndarray,
                mask: jnp.ndarray, rng: jax.Array, xi: float = 10.0,
                epi: float = 6.0, num_iters: int = 1,
                losstype: str = "kl") -> jnp.ndarray:
    """VAT loss against a dual-headed model.

    apply_fn: x -> (logits1, logits2), params already bound (gradients w.r.t.
      params flow through the final adversarial pass only, like the reference
      where d is detached after power iteration).
    x: [B,H,W,Cin] input batch; soft1/soft2: [B,H,W,C] clean soft predictions
      (stop-gradient targets); mask: [B,H,W] disagreement mask gating the loss.
    """
    d = vat_direction(apply_fn, x, soft1, soft2, mask, rng, xi=xi,
                      num_iters=num_iters, losstype=losstype)
    l1, l2 = apply_fn(x + epi * d)
    return _divergence(l1, l2, jax.lax.stop_gradient(soft1),
                       jax.lax.stop_gradient(soft2), mask, losstype)
