"""Tail-oscillation diagnosis for the 30k run (VERDICT r4 item 3).

The low-LR tail of the 30k schedule shows large val-dice oscillations
(0.993 plateau -> dips to 0.84-0.95 with recoveries). Two hypotheses:

  H1 (stats): eval uses BN RUNNING stats; with momentum 0.9 they have a
     ~10-step horizon, and the channel-dropout pass feeds its PERTURBED
     batch statistics into them every step (reference semantics — torch BN
     updates running stats on every train-mode forward). A dip would then be
     a stats artifact, not a params regression.
  H2 (params): the fully-ramped consistency terms (VAT + dropout) destabilize
     the params themselves once the supervised anchor decays with LR.

Probe: load an archived dip checkpoint, eval as-is, then RECALIBRATE the
running stats with N clean train-mode forwards (no perturbation, stats
updates only, params frozen) and re-eval. Recovery => H1; no recovery => H2.

Arms (--arm):
  probe      the stats-recalibration probe above (default)
  continue   resume training from the checkpoint for --steps with the given
             branch overrides (e.g. semi.dropout=false semi.adv_noise=false)
             and log the val trajectory — the params-side A/B.

Usage:
  python scripts/diagnose_tail.py --ckpt runs_30k/ckpt_archive/step_27200 \
      [--arm probe] [--recal-steps 32]
  python scripts/diagnose_tail.py --ckpt ... --arm continue --steps 1200 \
      [overrides ...]
"""
import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from chap_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from chap_tpu.config import load_config  # noqa: E402
from chap_tpu.data.datasets import build_datasets  # noqa: E402
from chap_tpu.data.device_data import (build_device_batch_fn,  # noqa: E402
                                       build_device_pool)
from chap_tpu.data.transforms import RandomGenerator  # noqa: E402
from chap_tpu.eval.eval2d import evaluate_volumes, make_predictor  # noqa: E402
from chap_tpu.models import net_factory  # noqa: E402
from chap_tpu.train.state import create_train_state, make_optimizer  # noqa: E402
from chap_tpu.train.step_chap import build_chap_train_step  # noqa: E402


def run30k_cfg(overrides):
    cfg = load_config(None, list(overrides))
    cfg.data.dataset = "synthetic"
    cfg.model.dtype = "bfloat16"
    cfg.run.seed = 1337
    return cfg


def load_state(cfg, ckpt_path):
    import os

    import flax.serialization as fser
    import orbax.checkpoint as ocp

    model = net_factory("dualdecoder", 1, cfg.data.num_classes, cfg.model)
    opt = make_optimizer(cfg.optim.base_lr, cfg.optim.max_iterations,
                         cfg.optim.momentum, cfg.optim.weight_decay,
                         cfg.optim.poly_power)
    sample = jnp.zeros((cfg.data.batch_size, *cfg.data.image_size, 1))
    state = create_train_state(model, jax.random.PRNGKey(0), sample, opt,
                               sim_chns=tuple(cfg.model.feature_chns))
    # same state-dict flow as utils.checkpoint.CheckpointManager.restore
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(ckpt_path),
                             fser.to_state_dict(state))
    return model, opt, fser.from_state_dict(state, restored)


def evaluate(model, cfg, state, db_val):
    predictor = make_predictor(model, cfg.eval.model_type)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    m = evaluate_volumes(db_val, predictor, variables, cfg.data.num_classes,
                        cfg.data.image_size)
    return float(np.mean(m, axis=0)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--arm", default="probe", choices=["probe", "continue"])
    ap.add_argument("--recal-steps", type=int, default=32)
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    cfg = run30k_cfg(args.overrides)
    model, opt, state = load_state(cfg, args.ckpt)
    step0 = int(state.step)
    print(f"loaded step {step0} from {args.ckpt}", flush=True)

    transform = RandomGenerator(cfg.data.image_size, seed=cfg.run.seed)
    db_train, db_val = build_datasets(cfg.data, transform)

    d0 = evaluate(model, cfg, state, db_val)
    print(json.dumps({"arm": args.arm, "step": step0, "dice_as_is": round(d0, 4)}),
          flush=True)

    compute_dtype = jnp.bfloat16
    pool = build_device_pool(db_train, cfg.data.image_size, compute_dtype)
    batch_fn = build_device_batch_fn(len(db_train), 136, cfg.data.batch_size,
                                     cfg.data.labeled_bs)

    if args.arm == "probe":
        # clean train-mode forwards, stats updates ONLY (params frozen)
        @jax.jit
        def recal(batch_stats, image, rng):
            _, updates = model.apply(
                {"params": state.params, "batch_stats": batch_stats},
                image, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng})
            return updates["batch_stats"]

        bs = state.batch_stats
        r = jax.random.PRNGKey(7)
        for i in range(args.recal_steps):
            r, rb, rd = jax.random.split(r, 3)
            batch = batch_fn(pool, rb)
            bs = recal(bs, batch["image"], rd)
        d1 = evaluate(model, cfg, state.replace(batch_stats=bs), db_val)
        print(json.dumps({"arm": "probe", "step": step0,
                          "dice_as_is": round(d0, 4),
                          "dice_after_stat_recal": round(d1, 4),
                          "recal_steps": args.recal_steps,
                          "verdict": ("H1-stats" if d1 - d0 > 0.02
                                      else "H2-params")}), flush=True)
        return

    # arm == continue: resume training with the given branch overrides
    step_fn = build_chap_train_step(model, opt, cfg, use_nms=True)
    rng = jax.random.PRNGKey(step0)
    traj = []
    t0 = time.perf_counter()
    for it in range(1, args.steps + 1):
        rng, rb, rs = jax.random.split(rng, 3)
        state, metrics = step_fn(state, batch_fn(pool, rb), rs)
        if it % 400 == 0 or it == args.steps:
            dice = evaluate(model, cfg, state, db_val)
            traj.append((step0 + it, round(dice, 4)))
            print(f"  step {step0 + it}: val_dice {dice:.4f} "
                  f"({it / (time.perf_counter() - t0):.2f} it/s)", flush=True)
    print(json.dumps({"arm": "continue", "overrides": args.overrides,
                      "from": step0, "traj": traj}), flush=True)


if __name__ == "__main__":
    main()
