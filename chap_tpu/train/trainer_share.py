"""Shared-encoder (ACAL) training loop — rebuild of
train_share_encoder_2D.train (:139-467): joint CPS steps feeding a hard-sample
memory bank, with the min-max replay game kicking in after acal_start_iter
(:366-372), and both decoders evaluated separately every eval_every steps
(:394-458).

Mesh-sharded like trainer_2d/3d: batches are device_put with batch-dim
sharding, params/optimizer state replicated, and all three jitted programs
(joint, decoder-max, encoder-min) run SPMD with XLA-inserted psum gradient
reductions. Memory-bank semantics under sharding: the bank is HOST-side and
global — each feed gathers the full unlabeled half + knowledge map from all
devices (np.asarray on a sharded array is an all-gather to host), ranks
patches globally, and replay batches are re-sharded onto the mesh exactly
like data batches. This keeps the reference's global hard-sample ranking
(train_share_encoder_2D.py:344) instead of per-device banks that would rank
only local shards.
"""
from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from chap_tpu.config import Config
from chap_tpu.data.datasets import build_datasets, patients_to_slices
from chap_tpu.data.pipeline import BatchLoader, compact_batch, prefetch_to_device
from chap_tpu.data.sampler import TwoStreamBatchSampler
from chap_tpu.data.transforms import RandomGenerator
from chap_tpu.eval.eval2d import evaluate_volumes, make_predictor
from chap_tpu.models import net_factory
from chap_tpu.parallel.mesh import MeshSpec, batch_sharding, build_mesh, replicate
from chap_tpu.semi.memory_bank import ImageMemoryBank
from chap_tpu.train.step_share import (
    build_acal_steps,
    build_share_joint_step,
    create_share_state,
)
from chap_tpu.utils.checkpoint import CheckpointManager
from chap_tpu.utils.metrics_writer import MetricsWriter


def train(cfg: Config, snapshot_path: str, max_steps: Optional[int] = None) -> dict:
    if getattr(cfg.run, "prng_impl", "threefry2x32") != "threefry2x32":
        # rbg generates random bits far faster on TPU; draws differ from the
        # threefry default but dropout/perturbation draws are arbitrary
        jax.config.update("jax_default_prng_impl", cfg.run.prng_impl)
    rng = jax.random.PRNGKey(cfg.run.seed)
    num_classes = cfg.data.num_classes
    lbs = cfg.data.labeled_bs

    mesh = build_mesh(cfg.parallel.num_devices,
                      MeshSpec(dcn_size=cfg.parallel.dcn_axis_size))
    n_dev = int(np.prod(list(mesh.shape.values())))
    assert cfg.data.batch_size % n_dev == 0, \
        f"global batch {cfg.data.batch_size} must divide over {n_dev} devices"

    model = net_factory("acalnet", cfg.data.in_chns, num_classes, cfg.model)
    sample = jnp.zeros((cfg.data.batch_size, *cfg.data.image_size, cfg.data.in_chns))
    rng, init_rng = jax.random.split(rng)
    state, opt_g, opt_f = create_share_state(model, init_rng, sample, cfg)
    state = replicate(mesh, state)

    joint_step = build_share_joint_step(model, opt_g, opt_f, cfg)
    decoder_max_step, encoder_min_step = build_acal_steps(model, opt_g, opt_f, cfg)

    transform = RandomGenerator(cfg.data.image_size, seed=cfg.run.seed)
    db_train, db_val = build_datasets(cfg.data, transform)
    total_slices = len(db_train)
    labeled_slice = patients_to_slices(cfg.data.dataset, cfg.data.labeled_num)

    mb = ImageMemoryBank(cfg.semi.mb_capacity, cfg.data.image_size,
                         cfg.semi.mb_patch_size, seed=cfg.run.seed)
    writer = MetricsWriter(snapshot_path)
    ckpt = CheckpointManager(snapshot_path)
    predictors = {"model1": make_predictor(model, "model1"),
                  "model2": make_predictor(model, "model2")}

    max_iterations = max_steps or cfg.optim.max_iterations
    best = {"model1": 0.0, "model2": 0.0}
    data_sharding = batch_sharding(mesh, 4)
    label_sharding = batch_sharding(mesh, 3)
    mask_sharding = batch_sharding(mesh, 3)
    if cfg.semi.acal:
        assert lbs % n_dev == 0 and (cfg.data.batch_size - lbs) % n_dev == 0, \
            (f"ACAL replay shards both batch halves: labeled_bs={lbs} and "
             f"unlabeled {cfg.data.batch_size - lbs} must divide over "
             f"{n_dev} devices")
    iter_num = 0
    while iter_num < max_iterations:
        sampler = TwoStreamBatchSampler(
            list(range(labeled_slice)), list(range(labeled_slice, total_slices)),
            cfg.data.batch_size, cfg.data.batch_size - lbs,
            seed=cfg.run.seed + iter_num)
        loader = BatchLoader(db_train, sampler, cfg.data.num_workers)
        compute_dtype = (jnp.bfloat16 if cfg.model.dtype == "bfloat16"
                         else jnp.float32)

        def shard(b):
            b = compact_batch(b, compute_dtype)
            return {"image": jax.device_put(b["image"], data_sharding),
                    "label": jax.device_put(b["label"], label_sharding)}

        for batch in prefetch_to_device(loader, size=2, transform=shard):
            rng, r1, r2, r3 = jax.random.split(rng, 4)
            state, metrics, knowledge = joint_step(state, batch, r1)
            iter_num += 1

            # feed the hard-sample bank (train_share_encoder_2D.py:344);
            # each feed pulls the knowledge map to host — throttle via config
            if iter_num % cfg.semi.mb_feed_every == 0:
                mb.add(np.asarray(batch["image"][lbs:]), np.asarray(knowledge), 8)

            if cfg.semi.acal and iter_num > cfg.semi.acal_start_iter and len(mb):
                replay = mb.get_samples(cfg.data.batch_size - lbs)
                # assemble the replay batch on host, then re-shard it onto
                # the mesh like any data batch (bank is host-global)
                image = np.concatenate([np.asarray(batch["image"][:lbs]),
                                        replay["image"].astype(
                                            np.dtype(batch["image"].dtype))])
                image = jax.device_put(image, data_sharding)
                mask = jax.device_put(replay["mask"], mask_sharding)
                state, m_f = decoder_max_step(state, image, batch["label"], mask, r2)
                state, m_g = encoder_min_step(state, image, mask, r3)
                metrics = {**metrics, **m_f, **m_g}

            if iter_num % cfg.run.log_every == 0:
                writer.write(iter_num, {k: float(v) for k, v in metrics.items()})
                logging.info("iteration %d : model1 %.4f model2 %.4f", iter_num,
                             float(metrics["model1_loss"]), float(metrics["model2_loss"]))

            if iter_num > 0 and iter_num % cfg.eval.eval_every == 0:
                variables = {"params": state.params, "batch_stats": state.batch_stats}
                for name, predictor in predictors.items():
                    ml = evaluate_volumes(db_val, predictor, variables,
                                          num_classes, cfg.data.image_size,
                                          mesh=mesh if n_dev > 1 else None)
                    perf = float(np.mean(ml, axis=0)[0])
                    writer.write(iter_num, {f"{name}_val_mean_dice": perf,
                                            f"{name}_val_mean_hd95": float(np.mean(ml, axis=0)[1])})
                    if perf > best[name]:
                        best[name] = perf
                        ckpt.save(f"best_{name}", jax.device_get(state))
                ckpt.save_latest(jax.device_get(state))
            if iter_num >= max_iterations:
                break

    writer.close()
    return {"best_dice_model1": best["model1"], "best_dice_model2": best["model2"],
            "steps": iter_num}
