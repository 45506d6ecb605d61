"""2D training loop — the rebuild of train_ours_2D.train (train_ours_2D.py:219-464).

Orchestration only; all math lives in the jitted step:
  - two-stream batches stream through the threaded BatchLoader and are
    device_put with batch-dim sharding over the mesh (data-parallel);
  - every `eval_every` steps (200 in the reference), the full val set is
    evaluated with the batched slice evaluator, latest/best checkpoints are
    written, and val.csv is appended on improvement;
  - scalar metrics go to metrics.jsonl (+TB if available).
"""
from __future__ import annotations

import logging
import time
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
from chap_tpu.train.state import create_train_state, make_optimizer
from chap_tpu.train.step_chap import build_chap_train_step
from chap_tpu.train.step_supervised import build_supervised_train_step
from chap_tpu.utils.checkpoint import CheckpointManager
from chap_tpu.utils.metrics_writer import MetricsWriter


def train(cfg: Config, snapshot_path: str, mode: str = "chap",
          max_steps: Optional[int] = None, resume: bool = False) -> dict:
    """Returns {'best_dice': float, 'steps': int}."""
    if getattr(cfg.run, "prng_impl", "threefry2x32") != "threefry2x32":
        # rbg generates random bits far faster on TPU; draws differ from the
        # threefry default but dropout/perturbation draws are arbitrary
        jax.config.update("jax_default_prng_impl", cfg.run.prng_impl)
    rng = jax.random.PRNGKey(cfg.run.seed)
    num_classes = cfg.data.num_classes

    mesh = build_mesh(cfg.parallel.num_devices,
                      MeshSpec(dcn_size=cfg.parallel.dcn_axis_size))
    n_dev = int(np.prod(list(mesh.shape.values())))
    assert cfg.data.batch_size % n_dev == 0, \
        f"global batch {cfg.data.batch_size} must divide over {n_dev} devices"

    model = net_factory(cfg.model.name, cfg.data.in_chns, num_classes, cfg.model)
    optimizer = make_optimizer(cfg.optim.base_lr, cfg.optim.max_iterations,
                               cfg.optim.momentum, cfg.optim.weight_decay,
                               cfg.optim.poly_power)

    sample = jnp.zeros((cfg.data.batch_size, *cfg.data.image_size, cfg.data.in_chns))
    rng, init_rng = jax.random.split(rng)
    state = create_train_state(model, init_rng, sample, optimizer,
                               sim_chns=tuple(cfg.model.feature_chns))
    state = replicate(mesh, state)

    ckpt = CheckpointManager(snapshot_path)
    best_performance = 0.0
    if resume:
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state = replicate(mesh, restored)
            # restore the historical best so the first post-resume eval
            # cannot clobber the best slot (train_ours_2D.py:428-435 gating)
            best_performance = float(ckpt.load_meta().get("best_metric", 0.0))
            logging.info("resumed from step %d (best %.4f)",
                         int(state.step), best_performance)

    if mode == "chap":
        step_fn = build_chap_train_step(model, optimizer, cfg, use_nms=True,
                                        split=cfg.optim.split_step)
    elif mode == "ablation":
        from chap_tpu.train.step_ablation import build_ablation_train_step
        step_fn = build_ablation_train_step(model, optimizer, cfg)
    else:
        step_fn = build_supervised_train_step(model, optimizer, cfg, dual=True)

    transform = RandomGenerator(cfg.data.image_size, seed=cfg.run.seed)
    db_train, db_val = build_datasets(cfg.data, transform)
    total_slices = len(db_train)
    labeled_slice = patients_to_slices(cfg.data.dataset, cfg.data.labeled_num)
    logging.info("Total slices %d, labeled slices %d", total_slices, labeled_slice)

    writer = MetricsWriter(snapshot_path)
    predictor = make_predictor(model, cfg.eval.model_type)

    max_iterations = max_steps or cfg.optim.max_iterations
    data_sharding = batch_sharding(mesh, 4)
    label_sharding = batch_sharding(mesh, 3)

    compute_dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32

    def shard(batch):
        # `batch` holds this PROCESS's rows; in a multi-host run they
        # assemble into the global sharded array without any cross-host
        # gather (parallel/mesh.process_sharded_batch)
        batch = compact_batch(batch, compute_dtype)
        if jax.process_count() > 1:
            from chap_tpu.parallel.mesh import process_sharded_batch
            return process_sharded_batch(mesh, batch)
        return {"image": jax.device_put(batch["image"], data_sharding),
                "label": jax.device_put(batch["label"], label_sharding)}

    iter_num = int(state.step)
    start_iter = iter_num

    if cfg.data.device_input:
        # HBM-resident pool + on-device sampling/augmentation: zero per-step
        # h2d traffic (data/device_data.py — the PJRT plugin leaks every
        # transfer payload host-side, and this host has one core)
        from jax.sharding import NamedSharding, PartitionSpec
        from chap_tpu.data.device_data import (build_device_batch_fn,
                                               build_device_pool)
        pool = build_device_pool(
            db_train, cfg.data.image_size, compute_dtype,
            sharding=NamedSharding(mesh, PartitionSpec()) if n_dev > 1 else None)
        batch_fn = build_device_batch_fn(
            total_slices, labeled_slice, cfg.data.batch_size,
            cfg.data.labeled_bs,
            out_shardings={"image": data_sharding, "label": label_sharding}
            if n_dev > 1 else None)

        def batch_stream():
            # independent, resume-aware rng stream for batch sampling
            r = jax.random.fold_in(jax.random.PRNGKey(cfg.run.seed), start_iter)
            while True:
                r, rb = jax.random.split(r)
                yield batch_fn(pool, rb)
    else:
        def batch_stream():
            epoch_start = iter_num
            while True:
                sampler = TwoStreamBatchSampler(
                    list(range(labeled_slice)),
                    list(range(labeled_slice, total_slices)),
                    cfg.data.batch_size,
                    cfg.data.batch_size - cfg.data.labeled_bs,
                    seed=cfg.run.seed + epoch_start)
                if jax.process_count() > 1:
                    # every process builds the SAME global sampler (same
                    # seed), then loads only its contiguous slice
                    from chap_tpu.parallel.mesh import ProcessLocalBatchSampler
                    sampler = ProcessLocalBatchSampler(sampler)
                loader = BatchLoader(db_train, sampler, cfg.data.num_workers)
                yield from prefetch_to_device(loader, size=2, transform=shard)
                epoch_start += len(sampler)

    t_start = time.time()
    for batch in batch_stream():
        rng, step_rng = jax.random.split(rng)
        state, metrics = step_fn(state, batch, step_rng)
        iter_num += 1

        if iter_num % cfg.run.log_every == 0:
            scalars = {k: float(v) for k, v in metrics.items()}
            scalars["steps_per_sec"] = (
                (iter_num - start_iter) / (time.time() - t_start))
            # GradSim score statistics: the EMA channel scores drive the
            # dropout perturbation; their drift is the scale-stability
            # signal the 30k-iteration protocol depends on
            if getattr(state, "sim_scores", None):
                flat = np.concatenate(
                    [np.asarray(s).ravel() for s in state.sim_scores])
                scalars["sim_score_mean"] = float(flat.mean())
                scalars["sim_score_std"] = float(flat.std())
                scalars["sim_score_absmax"] = float(np.abs(flat).max())
            writer.write(iter_num, scalars)
            if "disagreement_ratio" in scalars:
                # per-iteration CSV like train_ablation_2D.py:183-190
                writer.append_csv(f"{snapshot_path}/disagreement.csv",
                                  {"iteration": iter_num,
                                   "ratio": scalars["disagreement_ratio"]})
            logging.info("iteration %d : loss : %.4f", iter_num, scalars["loss"])

        if iter_num > 0 and iter_num % cfg.eval.eval_every == 0:
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            metric_list = evaluate_volumes(db_val, predictor, variables,
                                           num_classes, cfg.data.image_size,
                                           mesh=mesh if n_dev > 1 else None)
            performance = float(np.mean(metric_list, axis=0)[0])
            mean_hd95 = float(np.mean(metric_list, axis=0)[1])
            writer.write(iter_num, {"val_mean_dice": performance,
                                    "val_mean_hd95": mean_hd95})
            ckpt.save_latest(jax.device_get(state))
            if performance > best_performance or not ckpt.has("best"):
                best_performance = performance
                ckpt.save_best(jax.device_get(state))
                ckpt.save_meta({"best_metric": best_performance,
                                "best_iteration": iter_num})
                writer.append_csv(
                    f"{snapshot_path}/val.csv",
                    {"timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
                     "iteration": iter_num,
                     "val_acc": round(best_performance, 4)})
            logging.info("iteration %d : mean_dice %.4f mean_hd95 %.4f",
                         iter_num, performance, mean_hd95)

        if iter_num >= max_iterations:
            break

    writer.close()
    return {"best_dice": best_performance, "steps": iter_num}
