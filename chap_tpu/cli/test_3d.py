"""3D test CLI — rebuild of test_LA.py (:41-65) and test_3D.py (:20-41):
dataset-switched sliding-window evaluation with the batched on-device engine.

Protocols (test_LA.py:23-35,50-58; test_3D.py:33-34):
    LA:          patch (112,112,80), stride_xy 18, stride_z 4,  2 classes
    Pancreas_CT: patch (96,96,96),  stride_xy 16, stride_z 16, 2 classes
    BraTS2019:   patch (96,96,96),  stride_xy 64, stride_z 64, 2 classes (unet_3D)

Usage:
    python -m chap_tpu.cli.test_3d --dataset LA --snapshot <run_dir> --nms 1
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from chap_tpu.config import Config
from chap_tpu.data.datasets import Volume3dDataset, SyntheticVolumeDataset
from chap_tpu.eval.sliding_window import test_all_case
from chap_tpu.models import net_factory_3d

PROTOCOLS = {
    "LA": dict(patch=(112, 112, 80), stride_xy=18, stride_z=4, model="vnet"),
    "Pancreas_CT": dict(patch=(96, 96, 96), stride_xy=16, stride_z=16, model="vnet"),
    "BraTS2019": dict(patch=(96, 96, 96), stride_xy=64, stride_z=64, model="unet_3D"),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="LA", choices=list(PROTOCOLS) + ["synthetic"])
    p.add_argument("--root_path", type=str, default=None)
    p.add_argument("--snapshot", type=str, default=None, help="run dir with checkpoints/")
    p.add_argument("--model", type=str, default=None)
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--nms", type=int, default=0)
    p.add_argument("--sw_batch", type=int, default=8)
    p.add_argument("--detail", type=int, default=0, help="per-case metric lines")
    args = p.parse_args()

    proto = PROTOCOLS.get(args.dataset, PROTOCOLS["LA"])
    model_name = args.model or proto["model"]
    cfg = Config()
    model = net_factory_3d(model_name, cfg.data.in_chns, args.num_classes,
                           mode="test", cfg=cfg.model)

    sample = jnp.zeros((1, *proto["patch"], 1))
    if args.snapshot:
        from chap_tpu.train.state import create_train_state, make_optimizer
        from chap_tpu.utils.checkpoint import CheckpointManager
        template = create_train_state(model, jax.random.PRNGKey(0), sample,
                                      make_optimizer(0.01, 1000))
        state = CheckpointManager(args.snapshot).restore("best", template)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    else:
        variables = model.init({"params": jax.random.PRNGKey(0)}, sample, train=False)

    if args.dataset == "synthetic":
        ds = SyntheticVolumeDataset((96, 112, 112), args.num_classes, length=2)

        class _T:  # transpose synthetic [D,H,W] -> [W,H,D]
            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                s = ds[i]
                return {"image": np.transpose(s["image"], (2, 1, 0)),
                        "label": np.transpose(s["label"], (2, 1, 0)),
                        "case": s["case"]}

        dataset = _T()
    else:
        dataset = Volume3dDataset(args.root_path, "test.list")

    per_case = [] if args.detail else None
    metrics = test_all_case(model, variables, dataset, args.num_classes,
                            proto["patch"], proto["stride_xy"], proto["stride_z"],
                            sw_batch=args.sw_batch, nms=bool(args.nms),
                            full_metrics=True, per_case=per_case)
    if per_case:
        for case, m in per_case:
            print(f"{case}: {m.mean(axis=0)}")
    print("per-class (dice, ravd, hd95, asd):")
    print(metrics)
    print("mean:", metrics.mean(axis=0))


if __name__ == "__main__":
    main()
