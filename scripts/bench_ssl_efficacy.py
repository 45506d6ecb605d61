"""SSL-efficacy ladder: supervised-only vs CHAP-base vs full CHAP at a
MATCHED step budget on the HARD synthetic protocol (datasets.synthetic_hard).

This is the rebuild's substitute for the reference's entire reason to exist
(train_ours_2D.py:219-464): evidence that the semi-supervised machinery
(BCP+CPS+NMS, then +GradSim-dropout+VAT) beats supervised-only under label
scarcity. The plain phantoms saturate at dice ~0.99 for everything; the hard
protocol (nested wobbly anatomy, background distractors wearing foreground
intensities, bias field + heavy noise, N_LABELED labeled slices) keeps
supervised-only below that so the ladder is measurable.

Rungs (all identical model/optimizer/schedule/seed, same step budget):
  supervised  dice+CE on batches resampled from ONLY the N_LABELED slices
  chap-base   two-stream batches, BCP mixing + cross pseudo supervision +
              on-device largest-CC NMS (semi.adv_noise=semi.dropout=False)
  chap-full   + GradSim channel-dropout consistency + masked VAT

Usage: python scripts/bench_ssl_efficacy.py [steps] [rung ...]
Writes one JSON line per rung; paste the table into BENCH_NOTES.md.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from chap_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from chap_tpu.config import Config  # noqa: E402
from chap_tpu.data.datasets import (SyntheticSliceDataset,  # noqa: E402
                                    SyntheticVolumeDataset)
from chap_tpu.eval.eval2d import evaluate_volumes, make_predictor  # noqa: E402
from chap_tpu.models import net_factory  # noqa: E402
from chap_tpu.train.state import create_train_state, make_optimizer  # noqa: E402
from chap_tpu.train.step_chap import build_chap_train_step  # noqa: E402
from chap_tpu.train.step_supervised import build_supervised_train_step  # noqa: E402

SIZE = 128
N_CLASSES = 4
BATCH = 24
LABELED_BS = 12
N_LABELED = 16          # labeled slices — scarce enough that sup-only overfits
TRAIN_SIZE = 768
VAL_VOLUMES = 4
EVAL_EVERY = 500


def make_cfg(rung: str) -> Config:
    cfg = Config()
    cfg.data.dataset = "synthetic_hard"
    cfg.data.num_classes = N_CLASSES
    cfg.data.batch_size = BATCH
    cfg.data.labeled_bs = LABELED_BS
    cfg.data.image_size = (SIZE, SIZE)
    cfg.model.dtype = "bfloat16"
    cfg.optim.max_iterations = 30000   # reference LR schedule length
    cfg.semi.adv_noise = rung == "chap-full"
    cfg.semi.dropout = rung == "chap-full"
    return cfg


_POOL = None


def _pool():
    """Pre-materialized raw slice pool: per-draw phantom generation through
    the transform was host-bound (~0.4 s/batch — the first ladder attempt
    timed out on it). The hard protocol's per-index variance IS the
    augmentation, so rungs draw raw slices from a fixed pool."""
    global _POOL
    if _POOL is None:
        train = SyntheticSliceDataset(SIZE, N_CLASSES, TRAIN_SIZE, seed=0,
                                      hard=True)
        imgs = np.stack([train[i]["image"] for i in range(TRAIN_SIZE)])
        labs = np.stack([train[i]["label"] for i in range(TRAIN_SIZE)])
        _POOL = (imgs.astype(np.float32)[..., None], labs.astype(np.int32))
    return _POOL


_POOL_DEV = None


def batches(rung: str, seed: int = 0):
    """Deterministic batch stream. chap rungs: two-stream (first LABELED_BS
    labeled, rest unlabeled); supervised: all indices < N_LABELED.

    The pool lives ON DEVICE (one upload); per-step traffic is a 24-int
    index array — the per-transfer host leak and the single host core both
    drop out of the loop (data/device_data.py rationale)."""
    global _POOL_DEV
    if _POOL_DEV is None:
        imgs, labs = _pool()
        _POOL_DEV = (jax.device_put(jnp.asarray(imgs, jnp.bfloat16)),
                     jax.device_put(jnp.asarray(labs, jnp.uint8)))
    imgs_d, labs_d = _POOL_DEV
    rng = np.random.RandomState(seed)
    while True:
        if rung == "supervised":
            idxs = rng.randint(0, N_LABELED, BATCH)
        else:
            lab = rng.randint(0, N_LABELED, LABELED_BS)
            unl = rng.randint(N_LABELED, TRAIN_SIZE, BATCH - LABELED_BS)
            idxs = np.concatenate([lab, unl])
        ix = jnp.asarray(idxs)
        yield {"image": imgs_d[ix], "label": labs_d[ix]}


def run(rung: str, steps: int) -> dict:
    cfg = make_cfg(rung)
    model = net_factory("dualdecoder", 1, N_CLASSES, cfg.model)
    opt = make_optimizer(cfg.optim.base_lr, cfg.optim.max_iterations)
    sample = jnp.zeros((BATCH, SIZE, SIZE, 1))
    state = create_train_state(model, jax.random.PRNGKey(0), sample, opt,
                               sim_chns=tuple(cfg.model.feature_chns))
    if rung == "supervised":
        step_fn = build_supervised_train_step(model, opt, cfg, dual=True)
    else:
        step_fn = build_chap_train_step(model, opt, cfg, use_nms=True)
    val = SyntheticVolumeDataset((10, SIZE, SIZE), N_CLASSES, VAL_VOLUMES,
                                 hard=True)
    predictor = make_predictor(model, "logit_ensemble")
    stream = batches(rung)
    rng = jax.random.PRNGKey(1)
    best = 0.0
    t0 = time.perf_counter()
    for it in range(1, steps + 1):
        rng, r = jax.random.split(rng)
        state, metrics = step_fn(state, next(stream), r)
        if it % EVAL_EVERY == 0 or it == steps:
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            m = evaluate_volumes(val, predictor, variables, N_CLASSES,
                                 (SIZE, SIZE))
            dice = float(np.mean(m, axis=0)[0])
            best = max(best, dice)
            print(f"  {rung} it {it}: val_dice {dice:.4f} "
                  f"(loss {float(metrics['loss']):.3f}, "
                  f"{it / (time.perf_counter() - t0):.2f} it/s)", flush=True)
    out = {"rung": rung, "steps": steps, "labeled_slices": N_LABELED,
           "best_val_dice": round(best, 4),
           "wall_s": round(time.perf_counter() - t0, 1)}
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    rungs = sys.argv[2:] or ["supervised", "chap-base", "chap-full"]
    results = [run(r, steps) for r in rungs]
    print(json.dumps({"ladder": results}))
