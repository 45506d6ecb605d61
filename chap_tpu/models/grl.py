"""Gradient reversal layer with warm-start schedule (reference grl.py:12-81).

JAX-native: a custom_vjp identity whose cotangent is scaled by -lambda, with
the warm-start coefficient lambda(step) = 2(hi-lo)/(1+exp(-alpha*step/max))
- (hi-lo) + lo computed as a pure function of the step counter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gradient_reverse(x: jnp.ndarray, coeff: jnp.ndarray) -> jnp.ndarray:
    return x


def _fwd(x, coeff):
    return x, coeff


def _bwd(coeff, g):
    return (-coeff * g, None)


gradient_reverse.defvjp(_fwd, _bwd)


def warm_start_coeff(step, alpha: float = 1.0, lo: float = 0.0, hi: float = 1.0,
                     max_iters: int = 1000):
    """lambda warm schedule (grl.py:71-74)."""
    p = jnp.minimum(step, max_iters) / max_iters
    return (2.0 * (hi - lo) / (1.0 + jnp.exp(-alpha * p)) - (hi - lo) + lo)
