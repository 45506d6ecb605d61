"""LR schedule family — rebuild of networks_other.get_scheduler (:95-142).

The trainers themselves use the poly schedule (train/state.make_lr_schedule,
train_ours_2D.py:387-389); these are the additional policies the reference's
get_scheduler offers. All pure policies are step -> multiplier functions
compatible with optax (wrap with ``lambda s: base_lr * schedule(s)`` or feed
into optax.sgd directly); 'plateau' is inherently stateful (metric-driven) and
is provided as a small host-side controller the train loop consults.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def lambda_linear(niter: int, niter_decay: int, epoch_count: int = 1
                  ) -> Callable:
    """'lambda': flat then linear decay to 0 over niter_decay epochs
    (networks_other.py:98-101)."""
    def schedule(epoch):
        over = jnp.maximum(0, epoch + 1 + epoch_count - niter)
        return 1.0 - over / float(niter_decay + 1)
    return schedule


def step_decay(step_size: int, gamma: float = 0.5) -> Callable:
    """'step' (gamma 0.5) / 'step2' (gamma 0.1): multiply every step_size
    epochs (networks_other.py:102-105)."""
    def schedule(epoch):
        return gamma ** (epoch // step_size)
    return schedule


def step_warmstart(boundaries=(5, 100, 200)) -> Callable:
    """'step_warmstart': 0.1 warmup, 1.0, 0.1, 0.01 piecewise
    (networks_other.py:111-123); 'step_warmstart2' uses (5, 50, 100)."""
    b0, b1, b2 = boundaries

    def schedule(epoch):
        return jnp.where(epoch < b0, 0.1,
                         jnp.where(epoch < b1, 1.0,
                                   jnp.where(epoch < b2, 0.1, 0.01)))
    return schedule


class ReduceLROnPlateau:
    """'plateau' / 'plateau2' (networks_other.py:106-110): mode='min',
    relative threshold 0.01, patience 5, factor 0.1 / 0.2. Stateful and
    metric-driven, so it lives host-side: call step(metric) after each eval
    and multiply the base lr by .scale (feed it into the jitted step as a
    scalar argument)."""

    def __init__(self, factor: float = 0.1, patience: int = 5,
                 threshold: float = 0.01):
        self.factor, self.patience, self.threshold = factor, patience, threshold
        self.best = float("inf")
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return self.scale


def get_lr_schedule(policy: str, **opt):
    """Dispatch mirroring get_scheduler's policy names (networks_other.py:95-142).
    Returns a step->multiplier schedule, or a ReduceLROnPlateau controller for
    the plateau policies."""
    if policy == "lambda":
        return lambda_linear(opt["niter"], opt["niter_decay"],
                             opt.get("epoch_count", 1))
    if policy == "step":
        return step_decay(opt["lr_decay_iters"], 0.5)
    if policy == "step2":
        return step_decay(opt["lr_decay_iters"], 0.1)
    if policy == "plateau":
        return ReduceLROnPlateau(factor=0.1)
    if policy == "plateau2":
        return ReduceLROnPlateau(factor=0.2)
    if policy == "step_warmstart":
        return step_warmstart((5, 100, 200))
    if policy == "step_warmstart2":
        return step_warmstart((5, 50, 100))
    raise NotImplementedError(f"learning rate policy [{policy}] is not implemented")
