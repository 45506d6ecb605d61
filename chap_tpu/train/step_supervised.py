"""Supervised baseline train step: CE + dice on labeled slices.

The reference's fully-supervised protocol (loss 0.5*(CE + Dice), the standard
supervised arm of train_share_encoder_2D.py:322-327), applied to either a
single- or dual-decoder model. This is BASELINE.json config #1 (CPU-runnable
ACDC supervised).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from chap_tpu.config import Config
from chap_tpu.losses.dice import dice_ce_supervised
from chap_tpu.train.state import TrainState
from chap_tpu.train.step_chap import StepOutput


def build_supervised_train_step(model, optimizer, cfg: Config,
                                dual: bool = True):
    num_classes = cfg.data.num_classes

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
             ) -> StepOutput:
        # labels may arrive uint8 (compact host->device transfer,
        # data/pipeline.compact_batch) — widen once on device
        image = batch["image"]
        label = batch["label"].astype(jnp.int32)
        r_drop, r_pert = jax.random.split(rng)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image, train=True, mutable=["batch_stats"],
                rngs={"dropout": r_drop, "perturb": r_pert})
            if dual:
                o1, o2 = out
                loss = (dice_ce_supervised(o1, label, num_classes)
                        + dice_ce_supervised(o2, label, num_classes))
            else:
                loss = dice_ce_supervised(out, label, num_classes)
            return loss, updates["batch_stats"]

        (loss, batch_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=batch_stats, opt_state=opt_state)
        return StepOutput(new_state, {"loss": loss})

    return jax.jit(step, donate_argnums=(0,))
