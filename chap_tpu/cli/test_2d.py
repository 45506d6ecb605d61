"""ACDC 2D test CLI — rebuild of test_2D_fully.py (:97-155): per-case h5 eval
with the dual-decoder logit-ensemble, Dice/HD95/ASD/JC per class, appended
results txt.

Usage:
    python -m chap_tpu.cli.test_2d --snapshot model/ACDC/bcp_7_labeled/dualdecoder/run_0
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from chap_tpu.config import Config, update_values
from chap_tpu.data.datasets import AcdcVolumeDataset, SyntheticVolumeDataset
from chap_tpu.eval.eval2d import make_predictor, test_single_volume
from chap_tpu.models import net_factory
from chap_tpu.train.state import create_train_state, make_optimizer
from chap_tpu.utils.checkpoint import CheckpointManager

import jax.numpy as jnp
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--snapshot", type=str, required=True,
                   help="run dir containing checkpoints/ and config.json")
    p.add_argument("--ckpt", type=str, default="best", choices=["best", "latest"])
    p.add_argument("--model_type", type=str, default="logit_ensemble")
    p.add_argument("--split", type=str, default="test")
    args = p.parse_args()

    cfg = Config()
    cfg_path = os.path.join(args.snapshot, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            update_values(json.load(f), cfg)

    model = net_factory(cfg.model.name, cfg.data.in_chns, cfg.data.num_classes,
                        cfg.model)
    optimizer = make_optimizer(cfg.optim.base_lr, cfg.optim.max_iterations)
    sample = jnp.zeros((1, *cfg.data.image_size, cfg.data.in_chns))
    template = create_train_state(model, jax.random.PRNGKey(0), sample, optimizer,
                                  sim_chns=tuple(cfg.model.feature_chns))
    ckpt = CheckpointManager(args.snapshot)
    state = ckpt.restore(args.ckpt, template)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    if cfg.data.dataset == "synthetic":
        ds = SyntheticVolumeDataset((10, *cfg.data.image_size), cfg.data.num_classes)
    else:
        ds = AcdcVolumeDataset(cfg.data.root_path, split=args.split)

    predictor = make_predictor(model, args.model_type)
    total = None
    for i in range(len(ds)):
        sample_i = ds[i]
        m = np.array(test_single_volume(sample_i["image"], sample_i["label"],
                                        predictor, variables, cfg.data.num_classes,
                                        cfg.data.image_size, full_metrics=True))
        print(f"{sample_i.get('case', i)}: {m.mean(axis=0)}")
        total = m if total is None else total + m
    mean = total / len(ds)
    print("per-class (dice, hd95, asd, jc):")
    print(mean)
    print("mean:", mean.mean(axis=0))
    # appended results file, matching test_2D_fully.py:147-149
    with open(os.path.join(args.snapshot, "performance.txt"), "a") as f:
        f.write(f"{args.ckpt} {args.model_type}: {mean.mean(axis=0).tolist()}\n")


if __name__ == "__main__":
    main()
