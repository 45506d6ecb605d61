"""Consistency-weight ramp schedules.

Rebuild of the missing ``utils.ramps`` contract (SURVEY.md §2.4; used at
train_ours_2D.py:34-36 with epoch = iter_num // 150).
"""
from __future__ import annotations

import jax.numpy as jnp


def sigmoid_rampup(current, rampup_length):
    """Exponential sigmoid ramp from Laine & Aila (exp(-5(1-t)^2)).

    Works on python floats and traced jnp scalars alike so it can live inside
    a jitted train step.
    """
    if rampup_length == 0:
        return 1.0
    phase = 1.0 - jnp.clip(current / rampup_length, 0.0, 1.0)
    return jnp.exp(-5.0 * phase * phase)


def linear_rampup(current, rampup_length):
    if rampup_length == 0:
        return 1.0
    return jnp.clip(current / rampup_length, 0.0, 1.0)


def cosine_rampdown(current, rampdown_length):
    return 0.5 * (jnp.cos(jnp.pi * jnp.clip(current / rampdown_length, 0.0, 1.0)) + 1.0)
