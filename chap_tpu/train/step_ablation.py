"""Ablation trainer step — rebuild of train_ablation_2D.train (:92-354): plain
cross-pseudo-supervision (no BCP mixing) over the dual decoder, with toggleable
VAT and channel-dropout consistency, plus the per-iteration decoder
disagreement ratio the reference logs to CSV (:183-190).

Reference latent bugs fixed rather than ported: `csv_file` referenced
undefined (:189) -> the ratio is returned as a step metric; `fp_loss`
undefined when --dropout (:209-213) -> the dropout branch actually computes
the perturbed-forward consistency like the primary trainer.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from chap_tpu.config import Config
from chap_tpu.losses.ce import cross_entropy, cross_entropy_per_pixel
from chap_tpu.losses.dice import dice_ce_supervised
from chap_tpu.losses.vat import vat_loss_2d
from chap_tpu.semi.patchmask import create_mask_v1
from chap_tpu.train.state import TrainState
from chap_tpu.train.step_chap import StepOutput
from chap_tpu.train.step_share import sharpening
from chap_tpu.utils.ramps import sigmoid_rampup


def build_ablation_train_step(model, optimizer, cfg: Config):
    num_classes = cfg.data.num_classes
    lbs = cfg.data.labeled_bs
    semi = cfg.semi

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
             ) -> StepOutput:
        # labels may arrive uint8 (compact host->device transfer,
        # data/pipeline.compact_batch) — widen once on device
        image = batch["image"]
        label = batch["label"].astype(jnp.int32)
        r_main, r_fp, r_vat = jax.random.split(rng, 3)

        def loss_fn(params):
            (o1, o2), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image, train=True, mutable=["batch_stats"],
                rngs={"dropout": r_main})
            s1 = jax.nn.softmax(o1, axis=-1)
            s2 = jax.nn.softmax(o2, axis=-1)
            loss1 = dice_ce_supervised(o1[:lbs], label[:lbs], num_classes)
            loss2 = dice_ce_supervised(o2[:lbs], label[:lbs], num_classes)

            pseudo1 = jnp.argmax(jax.lax.stop_gradient(s1[lbs:]), axis=-1).astype(jnp.int32)
            pseudo2 = jnp.argmax(jax.lax.stop_gradient(s2[lbs:]), axis=-1).astype(jnp.int32)
            disagreement_ratio = jnp.mean((pseudo1 != pseudo2).astype(jnp.float32))

            if semi.consistency_type == "ce":
                ps1 = cross_entropy_per_pixel(o1[lbs:], pseudo2)
                ps2 = cross_entropy_per_pixel(o2[lbs:], pseudo1)
            else:
                pl1 = sharpening(s1[lbs:], semi.temperature)
                pl2 = sharpening(s2[lbs:], semi.temperature)
                ps1 = jnp.mean((s1[lbs:] - jax.lax.stop_gradient(pl2)) ** 2, axis=-1)
                ps2 = jnp.mean((s2[lbs:] - jax.lax.stop_gradient(pl1)) ** 2, axis=-1)
            knowledge = jax.lax.stop_gradient(ps1 + ps2)
            w = semi.consistency * sigmoid_rampup(state.step // 150,
                                                  semi.consistency_rampup)

            bs_cur = updates["batch_stats"]
            if semi.dropout:
                (f1, f2), up2 = model.apply(
                    {"params": params, "batch_stats": bs_cur},
                    image[lbs:], train=True, mutable=["batch_stats"],
                    rngs={"dropout": r_fp, "perturb": r_fp},
                    dropout_level=(0, 1, 2, 3, 4),
                    scores=list(state.sim_scores) if state.sim_scores else None,
                    comp_dropout=semi.comp_drop)
                fp_loss = cross_entropy(f1, pseudo2) + cross_entropy(f2, pseudo1)
                bs_cur = up2["batch_stats"]
            else:
                fp_loss = jnp.zeros(())

            if semi.adv_noise:
                diff_mask = create_mask_v1(pseudo1, pseudo2, knowledge,
                                           scale_factor=4, topk=semi.topk1)

                def vat_apply(x):
                    (a1, a2), _ = model.apply(
                        {"params": params, "batch_stats": bs_cur}, x,
                        train=True, mutable=["batch_stats"],
                        rngs={"dropout": r_vat})
                    return a1, a2

                vat = vat_loss_2d(vat_apply, image[lbs:],
                                  jax.lax.stop_gradient(s1[lbs:]),
                                  jax.lax.stop_gradient(s2[lbs:]),
                                  diff_mask, r_vat, xi=semi.noise_mag,
                                  epi=semi.adv_epi, losstype=semi.adv_losstype)
            else:
                vat = jnp.zeros(())

            total = (loss1 + loss2 + w * (jnp.mean(ps1) + jnp.mean(ps2))
                     + w * (semi.w_adv * vat + semi.w_drop * fp_loss))
            aux = {"batch_stats": bs_cur, "sup_loss": loss1 + loss2,
                   "fp_loss": fp_loss, "vat_loss": vat,
                   "disagreement_ratio": disagreement_ratio,
                   "consistency_weight": w}
            return total, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=aux.pop("batch_stats"),
                                  opt_state=opt_state)
        return StepOutput(new_state, {"loss": loss, **aux})

    return jax.jit(step, donate_argnums=(0,))
