"""Functional train state: params + BN stats + SGD(momentum) state + GradSim
scores + step, one pytree — the jitted step maps TrainState -> TrainState.

Optimizer matches the reference schedule exactly: SGD lr=0.01 momentum=0.9
weight_decay=1e-4 (train_ours_2D.py:278) with poly decay
lr = base * (1 - step/max_iter)^0.9 (train_ours_2D.py:387-389).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    sim_scores: Tuple[jnp.ndarray, ...] = ()
    ema_params: Optional[Any] = None


def make_lr_schedule(base_lr: float, max_iterations: int, power: float = 0.9):
    def schedule(step):
        frac = 1.0 - jnp.minimum(step, max_iterations) / max_iterations
        return base_lr * frac ** power
    return schedule


def make_optimizer(base_lr: float, max_iterations: int, momentum: float = 0.9,
                   weight_decay: float = 1e-4, power: float = 0.9):
    """torch-SGD-equivalent: grad += wd*param, then momentum buffer, then lr."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(make_lr_schedule(base_lr, max_iterations, power),
                  momentum=momentum),
    )


def create_train_state(model, rng: jax.Array, sample_input: jnp.ndarray,
                       optimizer: optax.GradientTransformation,
                       sim_chns: Tuple[int, ...] = (),
                       init_kwargs: Optional[dict] = None) -> TrainState:
    # jit the whole init: one compiled program instead of one tiny XLA
    # dispatch per initializer (matters on CPU and through the TPU tunnel)
    init_fn = jax.jit(lambda r: model.init({"params": r}, sample_input,
                                           train=False, **(init_kwargs or {})))
    variables = init_fn(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    sim_scores = tuple(jnp.zeros((c,), jnp.float32) for c in sim_chns)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        sim_scores=sim_scores,
    )


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def update_ema(ema_params, params, decay: float, step) -> Any:
    """Mean-teacher EMA with true-average warmup
    (train_ours_2D.py:50-54 update_ema_variables):
    alpha = min(1 - 1/(step+1), decay)."""
    alpha = jnp.minimum(1.0 - 1.0 / (step + 1.0), decay)
    return jax.tree.map(lambda e, p: alpha * e + (1 - alpha) * p, ema_params, params)
