"""3D semi-supervised training (BASELINE.json configs #4/#5: LA / Pancreas /
BraTS). The reference snapshot ships only 3D models + test CLIs (SURVEY.md
§0); this trainer completes the path with the FULL CHAP method in 3D:
the rank-generic CHAP step (chap_tpu.train.step_chap — teacher pass +
on-device largest-CC NMS + cuboid BCP mixing + channel-dropout/GradSim
consistency + VAT) over two-stream 3D patch batches, mesh-sharded and
device-prefetched like the 2D trainer, evaluated with the batched
sliding-window engine. A plain cross-pseudo-supervision step (mode="cps")
is kept as the lightweight ablation baseline.
"""
from __future__ import annotations

import logging
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from chap_tpu.config import Config
from chap_tpu.data.datasets import SyntheticVolumeDataset, Volume3dDataset
from chap_tpu.data.pipeline import BatchLoader, compact_batch, prefetch_to_device
from chap_tpu.data.sampler import TwoStreamBatchSampler
from chap_tpu.data.transforms3d import RandomGenerator3D
from chap_tpu.eval.sliding_window import test_all_case
from chap_tpu.losses.ce import cross_entropy_per_pixel
from chap_tpu.losses.dice import dice_ce_supervised
from chap_tpu.models import net_factory_3d
from chap_tpu.parallel.mesh import MeshSpec, batch_sharding, build_mesh, replicate
from chap_tpu.semi.gradsim import VNET_LEVEL_PATHS
from chap_tpu.train.state import TrainState, create_train_state, make_optimizer
from chap_tpu.train.step_chap import StepOutput, build_chap_train_step
from chap_tpu.utils.checkpoint import CheckpointManager
from chap_tpu.utils.metrics_writer import MetricsWriter
from chap_tpu.utils.ramps import sigmoid_rampup


class _PatchDataset:
    """Wrap a volume dataset as an infinite patch dataset."""

    def __init__(self, volumes, transform, length: int):
        self.volumes = volumes
        self.transform = transform
        self.length = length

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        return self.transform(self.volumes[idx % len(self.volumes)])


def build_cps3d_train_step(model, optimizer, cfg: Config):
    """Cross-pseudo-supervision step for a dual-decoder 3D model."""
    num_classes = cfg.data.num_classes
    lbs = cfg.data.labeled_bs
    semi = cfg.semi

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
             ) -> StepOutput:
        # labels may arrive uint8 (compact host->device transfer,
        # data/pipeline.compact_batch) — widen once on device
        image = batch["image"]
        label = batch["label"].astype(jnp.int32)
        if image.shape[0] <= lbs:
            raise ValueError(
                f"batch size {image.shape[0]} must exceed labeled_bs={lbs}: "
                f"the tail of each batch is the unlabeled stream, and a mean "
                f"over an empty unlabeled slice is silently NaN")

        def loss_fn(params):
            (o1, o2), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            s1 = jax.nn.softmax(o1, axis=-1)
            s2 = jax.nn.softmax(o2, axis=-1)
            sup1 = dice_ce_supervised(o1[:lbs], label[:lbs], num_classes)
            sup2 = dice_ce_supervised(o2[:lbs], label[:lbs], num_classes)
            pseudo1 = jnp.argmax(jax.lax.stop_gradient(s1[lbs:]), axis=-1)
            pseudo2 = jnp.argmax(jax.lax.stop_gradient(s2[lbs:]), axis=-1)
            ps1 = jnp.mean(cross_entropy_per_pixel(o1[lbs:], pseudo2))
            ps2 = jnp.mean(cross_entropy_per_pixel(o2[lbs:], pseudo1))
            w = semi.consistency * sigmoid_rampup(state.step // 150,
                                                  semi.consistency_rampup)
            total = sup1 + sup2 + w * (ps1 + ps2)
            return total, (updates["batch_stats"], sup1 + sup2, ps1 + ps2)

        (loss, (bstats, sup, cons)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=bstats, opt_state=opt_state)
        return StepOutput(new_state, {"loss": loss, "sup_loss": sup,
                                      "cons_loss": cons})

    return jax.jit(step, donate_argnums=(0,))


def build_supervised3d_train_step(model, optimizer, cfg: Config):
    """Fully-supervised 3D step (the BraTS2019 protocol, test_3D.py:20-35
    trains a plain unet_3D): dice+CE over the whole batch; dual-output models
    average both heads."""
    num_classes = cfg.data.num_classes

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
             ) -> StepOutput:
        # labels may arrive uint8 (compact host->device transfer,
        # data/pipeline.compact_batch) — widen once on device
        image = batch["image"]
        label = batch["label"].astype(jnp.int32)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            if isinstance(out, (tuple, list)):
                loss = sum(dice_ce_supervised(o, label, num_classes)
                           for o in out) / len(out)
            else:
                loss = dice_ce_supervised(out, label, num_classes)
            return loss, updates["batch_stats"]

        (loss, bstats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=bstats, opt_state=opt_state)
        return StepOutput(new_state, {"loss": loss, "sup_loss": loss})

    return jax.jit(step, donate_argnums=(0,))


def train(cfg: Config, snapshot_path: str, max_steps: Optional[int] = None,
          labeled_cases: int = 8, mode: str = "chap",
          resume: bool = False) -> dict:
    """mode: "chap" = full CHAP method (BCP+NMS+dropout/GradSim+VAT),
    "cps" = plain cross-pseudo-supervision baseline,
    "supervised" = fully-supervised (BraTS protocol; model = cfg.model.name_3d)."""
    patch = tuple(cfg.data.patch_size_3d)
    if getattr(cfg.run, "prng_impl", "threefry2x32") != "threefry2x32":
        # rbg generates random bits far faster on TPU; draws differ from the
        # threefry default but dropout/perturbation draws are arbitrary
        jax.config.update("jax_default_prng_impl", cfg.run.prng_impl)
    rng = jax.random.PRNGKey(cfg.run.seed)
    nf = cfg.model.n_filters_3d

    mesh = build_mesh(cfg.parallel.num_devices,
                      MeshSpec(dcn_size=cfg.parallel.dcn_axis_size))
    n_dev = int(np.prod(list(mesh.shape.values())))
    assert cfg.data.batch_size % n_dev == 0, \
        f"global batch {cfg.data.batch_size} must divide over {n_dev} devices"

    model_name = cfg.model.name_3d if mode == "supervised" else "dualdecoder"
    model = net_factory_3d(model_name, cfg.data.in_chns, cfg.data.num_classes,
                           mode="train", cfg=cfg.model)
    optimizer = make_optimizer(cfg.optim.base_lr, cfg.optim.max_iterations,
                               cfg.optim.momentum, cfg.optim.weight_decay,
                               cfg.optim.poly_power)
    sample = jnp.zeros((cfg.data.batch_size, *patch, cfg.data.in_chns))
    rng, init_rng = jax.random.split(rng)
    sim_chns = tuple(nf * m for m in (1, 2, 4, 8, 16)) if mode == "chap" else ()
    state = create_train_state(model, init_rng, sample, optimizer,
                               sim_chns=sim_chns)
    state = replicate(mesh, state)

    ckpt = CheckpointManager(snapshot_path)
    best = 0.0
    if resume:
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state = replicate(mesh, restored)
            # restore the historical best so the first post-resume eval
            # cannot clobber the best slot (train_ours_2D.py:428-435 gating)
            best = float(ckpt.load_meta().get("best_metric", 0.0))
            logging.info("resumed from step %d (best %.4f)",
                         int(state.step), best)

    if mode == "chap":
        # fused 3-instance passes are a measured 2D win (-23%) but a measured
        # 3D PESSIMIZATION (+31% at 64x64x48 — 3D convs at batch 4 already
        # fill the MXU and the vmapped stacking pays extra HBM traffic;
        # BENCH_NOTES round 5) and their graph OOMs the tunnel's remote
        # compiler at the LA patch; the 3D path always runs sequential passes
        if cfg.optim.fused_passes:
            import copy
            cfg = copy.deepcopy(cfg)
            cfg.optim.fused_passes = False
        step_fn = build_chap_train_step(model, optimizer, cfg, use_nms=True,
                                        level_paths=VNET_LEVEL_PATHS,
                                        split=cfg.optim.split_step)
    elif mode == "cps":
        step_fn = build_cps3d_train_step(model, optimizer, cfg)
    elif mode == "supervised":
        step_fn = build_supervised3d_train_step(model, optimizer, cfg)
    else:
        raise ValueError(f"unknown 3D trainer mode {mode!r}")

    if cfg.data.dataset == "synthetic":
        volumes = [
            {"image": np.transpose(v["image"], (2, 1, 0)),
             "label": np.transpose(v["label"], (2, 1, 0))}
            for v in (SyntheticVolumeDataset(
                (patch[2] + 8, patch[0] + 16, patch[1] + 16),
                cfg.data.num_classes, length=12)[i] for i in range(12))]
        val_ds = None
    else:
        train_ds = Volume3dDataset(cfg.data.root_path, "train.list")
        volumes = [train_ds[i] for i in range(len(train_ds))]
        val_ds = Volume3dDataset(cfg.data.root_path, "test.list")

    transform = RandomGenerator3D(patch, seed=cfg.run.seed)
    epoch_len = max(len(volumes) * 4, cfg.data.batch_size * 4)
    dataset = _PatchDataset(volumes, transform, epoch_len)

    writer = MetricsWriter(snapshot_path)
    max_iterations = max_steps or cfg.optim.max_iterations
    labeled_idx = list(range(min(labeled_cases * 4, epoch_len // 2)))
    unlabeled_idx = list(range(len(labeled_idx), epoch_len))

    data_sharding = batch_sharding(mesh, 5)
    label_sharding = batch_sharding(mesh, 4)

    compute_dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32

    def shard(batch):
        # per-process rows -> global sharded array in multi-host runs
        batch = compact_batch(batch, compute_dtype)
        if jax.process_count() > 1:
            from chap_tpu.parallel.mesh import process_sharded_batch
            return process_sharded_batch(mesh, batch)
        return {"image": jax.device_put(batch["image"], data_sharding),
                "label": jax.device_put(batch["label"], label_sharding)}

    iter_num = int(state.step)
    start_iter = iter_num

    if cfg.data.device_input:
        # HBM-resident padded-volume pool + on-device two-stream crop/rot-flip
        # (data/device_data.py): zero per-step h2d traffic. Labeled stream =
        # the first `labeled_cases` volumes (the LA-protocol reading).
        from jax.sharding import NamedSharding, PartitionSpec
        from chap_tpu.data.device_data import (build_device_patch_fn,
                                               build_device_volume_pool)
        pool = build_device_volume_pool(
            volumes, patch, compute_dtype,
            sharding=NamedSharding(mesh, PartitionSpec()) if n_dev > 1 else None)
        n_labeled_vols = min(labeled_cases, len(volumes))
        patch_fn = build_device_patch_fn(
            len(volumes), n_labeled_vols, cfg.data.batch_size,
            cfg.data.labeled_bs, patch,
            out_shardings={"image": data_sharding, "label": label_sharding}
            if n_dev > 1 else None)

        def batch_stream():
            r = jax.random.fold_in(jax.random.PRNGKey(cfg.run.seed), start_iter)
            while True:
                r, rb = jax.random.split(r)
                yield patch_fn(pool, rb)
    else:
        def batch_stream():
            epoch_start = iter_num
            while True:
                sampler = TwoStreamBatchSampler(
                    labeled_idx, unlabeled_idx, cfg.data.batch_size,
                    cfg.data.batch_size - cfg.data.labeled_bs,
                    seed=cfg.run.seed + epoch_start)
                if jax.process_count() > 1:
                    from chap_tpu.parallel.mesh import ProcessLocalBatchSampler
                    sampler = ProcessLocalBatchSampler(sampler)
                loader = BatchLoader(dataset, sampler, cfg.data.num_workers)
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
            writer.write(iter_num, scalars)
            logging.info("iter %d loss %.4f", iter_num, scalars["loss"])
        if val_ds is not None and iter_num % cfg.eval.eval_every == 0:
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            m = test_all_case(model, variables, val_ds, cfg.data.num_classes,
                              patch, cfg.eval.stride_xy, cfg.eval.stride_z,
                              sw_batch=cfg.eval.sw_batch, nms=cfg.eval.nms,
                              mesh=mesh if n_dev > 1 else None)
            dice = float(m[:, 0].mean())
            writer.write(iter_num, {"val_mean_dice": dice})
            ckpt.save_latest(jax.device_get(state))
            if dice > best or not ckpt.has("best"):
                best = dice
                ckpt.save_best(jax.device_get(state))
                ckpt.save_meta({"best_metric": best,
                                "best_iteration": iter_num})
                writer.append_csv(
                    f"{snapshot_path}/val.csv",
                    {"timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
                     "iteration": iter_num,
                     "val_acc": round(best, 4)})
        elif iter_num % cfg.run.checkpoint_every == 0:
            ckpt.save_latest(jax.device_get(state))
        if iter_num >= max_iterations:
            break
    ckpt.save_latest(jax.device_get(state))
    writer.close()
    return {"best_dice": best, "steps": iter_num}
