"""Convert a reference PyTorch checkpoint (.pth state_dict) into a snapshot
directory loadable by chap_tpu's eval CLIs (cli/test_2d.py, cli/test_3d.py).

The reference distributes bare ``model.state_dict()`` files
(train_ours_2D.py:428-435, loaded at test_2D_fully.py:115-117 /
test_LA.py:44-46). This tool maps them onto the Flax models
(chap_tpu.convert.torch_import, layouts proven by the weight-copy parity
tests) and writes <out>/checkpoints/best + <out>/config.json.

Usage:
    python -m chap_tpu.cli.convert_torch \\
        --pth dualdecoder_best_model.pth --model dualdecoder \\
        --decoder_type mcnet --num_classes 4 --out runs/converted
    python -m chap_tpu.cli.convert_torch --pth vnet.pth --model vnet \\
        --num_classes 2 --out runs/converted_la
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp

from chap_tpu.config import Config
from chap_tpu.convert.torch_import import convert_state_dict
from chap_tpu.models import net_factory, net_factory_3d
from chap_tpu.train.state import create_train_state, make_optimizer
from chap_tpu.utils.checkpoint import CheckpointManager

_3D = {"vnet", "dualdecoder3d", "unet_3D"}


def load_state_dict(path: str):
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    # tolerate {"state_dict": ...} wrappers and DataParallel "module." prefixes
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in obj.items()}


def convert(pth: str, model_name: str, out: str, *, in_chns: int = 1,
            num_classes: int = 4, decoder_type: str = "mcnet",
            normalization: str = "batchnorm") -> str:
    cfg = Config()
    cfg.model.name = model_name
    cfg.model.decoder_type = decoder_type
    cfg.model.normalization_3d = normalization
    cfg.data.in_chns = in_chns
    cfg.data.num_classes = num_classes

    if model_name in _3D:
        model = net_factory_3d(model_name, in_chns, num_classes, mode="test",
                               cfg=cfg.model)
        sample = jnp.zeros((1, 32, 32, 16, in_chns))
    else:
        model = net_factory(model_name, in_chns, num_classes, cfg.model)
        sample = jnp.zeros((1, 64, 64, in_chns))

    variables = jax.jit(
        lambda r: model.init({"params": r}, sample, train=False))(
            jax.random.PRNGKey(0))
    converted = convert_state_dict(model_name, load_state_dict(pth), variables,
                                   decoder_type=decoder_type,
                                   normalization=normalization)

    # sim_scores only exist on the 2D CHAP train state (what cli/test_2d
    # restores with); the 3D eval CLI's template has none (cli/test_3d)
    sim = tuple(cfg.model.feature_chns) if model_name not in _3D else ()
    template = create_train_state(model, jax.random.PRNGKey(0), sample,
                                  make_optimizer(0.01, 1000), sim_chns=sim)
    state = template.replace(params=converted["params"],
                             batch_stats=converted.get("batch_stats", {}))

    os.makedirs(out, exist_ok=True)
    CheckpointManager(out).save("best", state)
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump({"model": {"name": model_name, "decoder_type": decoder_type,
                             "normalization_3d": normalization},
                   "data": {"in_chns": in_chns, "num_classes": num_classes}},
                  f, indent=2)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", type=str, required=True)
    p.add_argument("--model", type=str, required=True,
                   help="dualdecoder | unet | vnet | dualdecoder3d | unet_3D")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--in_chns", type=int, default=1)
    p.add_argument("--num_classes", type=int, default=4)
    p.add_argument("--decoder_type", type=str, default="mcnet")
    p.add_argument("--normalization", type=str, default="batchnorm")
    args = p.parse_args()
    out = convert(args.pth, args.model, args.out, in_chns=args.in_chns,
                  num_classes=args.num_classes, decoder_type=args.decoder_type,
                  normalization=args.normalization)
    print(f"converted {args.pth} -> {out}/checkpoints/best")


if __name__ == "__main__":
    main()
