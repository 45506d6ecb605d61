"""3D semi-supervised training CLI (LA / Pancreas_CT / BraTS2019 protocols).

Usage:
    python -m chap_tpu.cli.train_3d --dataset LA --root_path data/LA \
        --labeled_num 8 [key.path=value ...]
"""
from __future__ import annotations

import argparse
import logging
import os
import pprint

from chap_tpu.config import apply_overrides, config_to_dict, load_config
from chap_tpu.utils.launch import dump_config, init_save_folder, setup_logging, write_doc

PROTOCOLS = {
    "LA": dict(patch=(112, 112, 80), stride_xy=18, stride_z=4),
    "Pancreas_CT": dict(patch=(96, 96, 96), stride_xy=16, stride_z=16),
    "BraTS2019": dict(patch=(96, 96, 96), stride_xy=64, stride_z=64),
    "synthetic": dict(patch=(64, 64, 48), stride_xy=32, stride_z=24),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", type=str, default=None,
                   help="YAML config (e.g. configs/la_chap.yml); explicit "
                        "flags still win over YAML values")
    p.add_argument("--dataset", type=str, default=None, choices=list(PROTOCOLS))
    p.add_argument("--root_path", type=str, default=None)
    p.add_argument("--exp", type=str, default=None)
    p.add_argument("--max_iterations", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--labeled_bs", type=int, default=None)
    p.add_argument("--labeled_num", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--method", type=str, default=None,
                   choices=["chap", "cps", "supervised"],
                   help="chap = full method (BCP+NMS+dropout/GradSim+VAT); "
                        "cps = plain cross-pseudo-supervision baseline; "
                        "supervised = fully-supervised (BraTS protocol)")
    p.add_argument("--model", type=str, default=None,
                   help="net_factory_3d key for --method supervised "
                        "(e.g. unet_3D, test_3D.py:27)")
    p.add_argument("--adv_noise", action="store_true")
    p.add_argument("--dropout", action="store_true")
    p.add_argument("--comp_drop", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--text", type=str, default="null")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args()

    cfg = load_config(args.cfg)
    # flags default to None so a YAML-configured run isn't silently
    # clobbered by argparse defaults; precedence = flag > YAML > Config()
    dataset = args.dataset or (cfg.data.dataset if cfg.data.dataset in PROTOCOLS
                               else "LA")
    for item in args.overrides:   # positional data.dataset= wins even here
        if item.startswith("data.dataset="):
            dataset = item.split("=", 1)[1]
    proto = PROTOCOLS[dataset]
    cfg.data.dataset = dataset
    cfg.data.patch_size_3d = proto["patch"]
    cfg.eval.stride_xy = proto["stride_xy"]
    cfg.eval.stride_z = proto["stride_z"]
    if args.num_classes is not None:
        cfg.data.num_classes = args.num_classes
    if args.batch_size is not None:
        cfg.data.batch_size = args.batch_size
    if args.labeled_bs is not None:
        cfg.data.labeled_bs = args.labeled_bs
    if args.labeled_num is not None:
        cfg.data.labeled_num = args.labeled_num
    if args.root_path:
        cfg.data.root_path = args.root_path
    if args.max_iterations:
        cfg.optim.max_iterations = args.max_iterations
    if args.seed is not None:
        cfg.run.seed = args.seed
    if args.exp is not None:
        cfg.run.exp = args.exp
    if args.model is not None:
        cfg.model.name_3d = args.model
    if args.adv_noise:
        cfg.semi.adv_noise = True
    if args.dropout:
        cfg.semi.dropout = True
    if args.comp_drop:
        cfg.semi.comp_drop = True
    # positional key.path=value overrides win over everything, including the
    # dataset-name protocol pinning (needed e.g. for tiny-shape smoke runs)
    apply_overrides(cfg, args.overrides)
    method = args.method or ("chap" if cfg.semi.adv_noise or cfg.semi.dropout
                             else "cps")

    snapshot_path = os.path.join(cfg.run.snapshot_root, dataset,
                                 f"{cfg.run.exp}_{cfg.data.labeled_num}_labeled")
    os.makedirs(snapshot_path, exist_ok=True)
    model_dir = (cfg.model.name_3d if method == "supervised" else "dualdecoder3d")
    save_dir = init_save_folder(snapshot_path, model_dir,
                                reuse_last=args.resume)
    write_doc(save_dir, args.text)
    dump_config(save_dir, config_to_dict(cfg))
    setup_logging(save_dir)
    logging.info("%s", pprint.pformat(config_to_dict(cfg)))

    from chap_tpu.train.trainer_3d import train
    result = train(cfg, save_dir, labeled_cases=cfg.data.labeled_num,
                   mode=method, resume=args.resume)
    logging.info("done: %s", result)


if __name__ == "__main__":
    main()
