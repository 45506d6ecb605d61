"""Worst-case estimation loss — completes the `utils.losses` contract.

The reference constructs ``losses.WorstCaseEstimationLoss(loss_type=
args["worst_losstype"])`` (train_share_encoder_2D.py:197) but never invokes
it; the module holding it is missing from the snapshot (SURVEY.md §2.4).
This is a reconstruction from the name and its lineage: worst-case aware
self-training trains an ADVERSARIAL head to estimate the worst case of the
main head — agree on labeled data, maximally disagree on unlabeled data —
so the encoder can then be optimized against that worst case (the same
min-max shape as the ACAL game in train_ACAL_one_iter:201-299, which is
presumably why the criterion was staged there).

Pixel-level segmentation form, two terms:

  * labeled:   adversarial logits must match the main head's hard labeled
               predictions (CE, or MSE on probabilities per ``loss_type``);
  * unlabeled: adversarial head is pushed AWAY from the main head's hard
               predictions — NLL of (1 - p) under a shifted log, the
               standard worst-case term.

All inputs are NHWC class-last logits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _shift_log(x: jnp.ndarray, offset: float = 1e-6) -> jnp.ndarray:
    """log(x + offset) clipped to <= log(1): numerically safe log(1 - p)."""
    return jnp.log(jnp.clip(x + offset, max=1.0))


def worst_case_estimation_loss(y_l: jnp.ndarray, y_l_adv: jnp.ndarray,
                               y_u: jnp.ndarray, y_u_adv: jnp.ndarray,
                               loss_type: str = "ce",
                               eta_prime: float = 2.0) -> jnp.ndarray:
    """y_l / y_u: the main head's labeled / unlabeled logits (stop-gradient
    targets); y_l_adv / y_u_adv: the adversarial head's logits on the same
    inputs. Minimizing this w.r.t. the adversarial head trains the worst
    case; maximizing (or minimizing its negation) w.r.t. the encoder closes
    the min-max game."""
    pred_l = jnp.argmax(jax.lax.stop_gradient(y_l), axis=-1)
    if loss_type == "ce":
        logp = jax.nn.log_softmax(y_l_adv, axis=-1)
        loss_l = -jnp.mean(jnp.take_along_axis(
            logp, pred_l[..., None], axis=-1))
    elif loss_type == "mse":
        loss_l = jnp.mean((jax.nn.softmax(y_l_adv, axis=-1)
                           - jax.lax.stop_gradient(
                               jax.nn.softmax(y_l, axis=-1))) ** 2)
    else:
        raise ValueError(f"unknown worst-case loss_type {loss_type!r}")

    pred_u = jnp.argmax(jax.lax.stop_gradient(y_u), axis=-1)
    p_adv = jax.nn.softmax(y_u_adv, axis=-1)
    loss_u = -jnp.mean(jnp.take_along_axis(
        _shift_log(1.0 - p_adv), pred_u[..., None], axis=-1))
    return eta_prime * loss_l + loss_u


class WorstCaseEstimationLoss:
    """Constructor-compatible wrapper mirroring the reference's
    ``losses.WorstCaseEstimationLoss(loss_type=...)`` staging
    (train_share_encoder_2D.py:197)."""

    def __init__(self, loss_type: str = "ce", eta_prime: float = 2.0):
        if loss_type not in ("ce", "mse"):
            raise ValueError(f"unknown worst-case loss_type {loss_type!r}")
        self.loss_type = loss_type
        self.eta_prime = eta_prime

    def __call__(self, y_l, y_l_adv, y_u, y_u_adv):
        return worst_case_estimation_loss(y_l, y_l_adv, y_u, y_u_adv,
                                          self.loss_type, self.eta_prime)
