"""Shared-encoder adversarial (ACAL) trainer steps.

Rebuild of train_share_encoder_2D.train (:139-467) + train_ACAL_one_iter
(:201-299): dual decoders over a shared encoder trained with cross pseudo
supervision, plus a min-max game on hard replayed samples — decoders MAXIMIZE
mutual discrepancy (while keeping supervised accuracy), encoder MINIMIZES it.

TPU-first realization of the reference's split optimizers
(optimizer_g=encoder / optimizer_f=decoders, :183-184): one param tree, two
``optax.masked`` SGD chains over the encoder/decoder subtrees; each phase
zero-masks the other group's gradients, so "freezing the encoder" is a
stop_gradient + mask instead of torch.no_grad + separate Parameter groups.
Three jitted programs: joint CPS step, decoder max-step, encoder min-step.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from chap_tpu.config import Config
from chap_tpu.losses.ce import (
    cross_entropy,
    cross_entropy_per_pixel,
    mse_loss,
    mse_loss_noreduction,
)
from chap_tpu.losses.dice import dice_ce_supervised, soft_dice_loss_masked
from chap_tpu.utils.ramps import sigmoid_rampup


@flax.struct.dataclass
class ShareTrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state_g: Any      # encoder
    opt_state_f: Any      # decoders


def _is_encoder_path(path) -> bool:
    return path[0].key == "encoder"


def encoder_mask(params):
    return jax.tree_util.tree_map_with_path(lambda p, _: _is_encoder_path(p), params)


def decoder_mask(params):
    return jax.tree_util.tree_map_with_path(lambda p, _: not _is_encoder_path(p), params)


def _mask_grads(grads, keep_encoder: bool):
    return jax.tree_util.tree_map_with_path(
        lambda p, g: g if (_is_encoder_path(p) == keep_encoder) else jnp.zeros_like(g),
        grads)


def sharpening(p: jnp.ndarray, temperature: float = 0.1) -> jnp.ndarray:
    """Temperature sharpening p^T/(p^T + (1-p)^T) (train_ours_2D.py:60-64)."""
    t = 1.0 / temperature
    pt = p ** t
    return pt / (pt + (1.0 - p) ** t)


def make_group_optimizers(cfg: Config):
    from chap_tpu.train.state import make_lr_schedule
    def chain():
        return optax.chain(
            optax.add_decayed_weights(cfg.optim.weight_decay),
            optax.sgd(make_lr_schedule(cfg.optim.base_lr, cfg.optim.max_iterations,
                                       cfg.optim.poly_power), momentum=cfg.optim.momentum))
    opt_g = optax.masked(chain(), encoder_mask)
    opt_f = optax.masked(chain(), decoder_mask)
    return opt_g, opt_f


def create_share_state(model, rng, sample, cfg: Config) -> Tuple[ShareTrainState, Any, Any]:
    opt_g, opt_f = make_group_optimizers(cfg)
    variables = model.init({"params": rng}, sample, train=False)
    params = variables["params"]
    return (ShareTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state_g=opt_g.init(params),
        opt_state_f=opt_f.init(params),
    ), opt_g, opt_f)


def build_share_joint_step(model, opt_g, opt_f, cfg: Config):
    """Joint CPS step (train_share_encoder_2D.py:307-356). Also returns the
    per-pixel 'knowledge' map that feeds the memory bank (:343-344)."""
    num_classes = cfg.data.num_classes
    lbs = cfg.data.labeled_bs
    semi = cfg.semi

    def step(state: ShareTrainState, batch, rng):
        # labels may arrive uint8 (compact host->device transfer,
        # data/pipeline.compact_batch) — widen once on device
        image = batch["image"]
        label = batch["label"].astype(jnp.int32)
        r_drop = rng

        def loss_fn(params):
            (o1, o2), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image, train=True, mutable=["batch_stats"],
                rngs={"dropout": r_drop})
            s1 = jax.nn.softmax(o1, axis=-1)
            s2 = jax.nn.softmax(o2, axis=-1)
            loss1 = dice_ce_supervised(o1[:lbs], label[:lbs], num_classes)
            loss2 = dice_ce_supervised(o2[:lbs], label[:lbs], num_classes)
            if semi.consistency_type == "ce":
                pseudo1 = jnp.argmax(jax.lax.stop_gradient(s1[lbs:]), axis=-1)
                pseudo2 = jnp.argmax(jax.lax.stop_gradient(s2[lbs:]), axis=-1)
                ps1 = cross_entropy_per_pixel(o1[lbs:], pseudo2)
                ps2 = cross_entropy_per_pixel(o2[lbs:], pseudo1)
            else:  # mse with sharpened soft targets
                pl1 = sharpening(s1[lbs:], semi.temperature)
                pl2 = sharpening(s2[lbs:], semi.temperature)
                ps1 = jnp.mean((s1[lbs:] - jax.lax.stop_gradient(pl2)) ** 2, axis=-1)
                ps2 = jnp.mean((s2[lbs:] - jax.lax.stop_gradient(pl1)) ** 2, axis=-1)
            w = semi.consistency * sigmoid_rampup(state.step // 150,
                                                  semi.consistency_rampup)
            model1_loss = loss1 + w * jnp.mean(ps1)
            model2_loss = loss2 + w * jnp.mean(ps2)
            knowledge = jax.lax.stop_gradient(ps1 + ps2)
            return model1_loss + model2_loss, {
                "batch_stats": updates["batch_stats"], "knowledge": knowledge,
                "model1_loss": model1_loss, "model2_loss": model2_loss}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        up_f, opt_state_f = opt_f.update(_mask_grads(grads, False),
                                         state.opt_state_f, state.params)
        up_g, opt_state_g = opt_g.update(_mask_grads(grads, True),
                                         state.opt_state_g, state.params)
        params = jax.tree.map(lambda p, a, b: p + a + b, state.params, up_f, up_g)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=aux["batch_stats"],
                                  opt_state_f=opt_state_f, opt_state_g=opt_state_g)
        metrics = {"loss": loss, "model1_loss": aux["model1_loss"],
                   "model2_loss": aux["model2_loss"]}
        return new_state, metrics, aux["knowledge"]

    return jax.jit(step, donate_argnums=(0,))


def _discrepancy(s1, s2, mask, losstype: str):
    """Mutual decoder discrepancy on the unlabeled half, restricted to the
    replay patch mask (train_share_encoder_2D.py:242-256)."""
    if losstype == "mse":
        d1 = mse_loss_noreduction(s1, jax.lax.stop_gradient(s2))
        d2 = mse_loss_noreduction(s2, jax.lax.stop_gradient(s1))
        m = mask[..., None]
        denom = jnp.sum(mask) + 1e-16
        return (jnp.sum(d1 * m) + jnp.sum(d2 * m)) / denom
    elif losstype == "softdice":
        inv = 1.0 - mask  # reference: ~mask.bool() (:253-254)
        d1 = soft_dice_loss_masked(s1, jax.lax.stop_gradient(s2), inv)
        d2 = soft_dice_loss_masked(s2, jax.lax.stop_gradient(s1), inv)
        return d1 + d2
    raise ValueError(losstype)


def build_acal_steps(model, opt_g, opt_f, cfg: Config):
    """(decoder_max_step, encoder_min_step) for the replay min-max game."""
    num_classes = cfg.data.num_classes
    lbs = cfg.data.labeled_bs
    semi = cfg.semi

    def decoder_max_step(state: ShareTrainState, image, label, mask, rng):
        """Decoders maximize discrepancy while staying supervised; encoder
        frozen (stop_gradient on its features), loss = (sup) - dis (:257)."""

        def loss_fn(params):
            (o1, o2), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng}, stop_encoder_grad=True)
            s1 = jax.nn.softmax(o1, axis=-1)
            s2 = jax.nn.softmax(o2, axis=-1)
            lab1 = dice_ce_supervised(o1[:lbs], label[:lbs], num_classes)
            lab2 = dice_ce_supervised(o2[:lbs], label[:lbs], num_classes)
            dis = _discrepancy(s1[lbs:], s2[lbs:], mask, semi.adv_losstype)
            return (lab1 + lab2) - dis, (updates["batch_stats"], dis)

        (loss, (bstats, dis)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        up_f, opt_state_f = opt_f.update(_mask_grads(grads, False),
                                         state.opt_state_f, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, up_f)
        return state.replace(params=params, batch_stats=bstats,
                             opt_state_f=opt_state_f), {"dis_loss": dis,
                                                        "acal_f_loss": loss}

    def encoder_min_step(state: ShareTrainState, image, mask, rng):
        """Encoder minimizes the same discrepancy (:266-299)."""

        def loss_fn(params):
            (o1, o2), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            s1 = jax.nn.softmax(o1, axis=-1)
            s2 = jax.nn.softmax(o2, axis=-1)
            dis = _discrepancy(s1[lbs:], s2[lbs:], mask, semi.adv_losstype)
            return dis, updates["batch_stats"]

        (dis, bstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        up_g, opt_state_g = opt_g.update(_mask_grads(grads, True),
                                         state.opt_state_g, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, up_g)
        return state.replace(params=params, batch_stats=bstats,
                             opt_state_g=opt_state_g), {"dis_loss_g": dis}

    return jax.jit(decoder_max_step), jax.jit(encoder_min_step)
