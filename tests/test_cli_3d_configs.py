"""e2e smokes of the shipped 3D protocol configs (VERDICT r2 item 10): each
YAML drives the train_3d CLI end-to-end on the synthetic dataset at tiny
shapes (positional overrides win over the protocol pinning)."""
import os
import sys

import pytest


def _run_cli(tmp_path, cfg_name, method=None, extra=()):
    from chap_tpu.cli.train_3d import main
    argv = ["train_3d", "--cfg", f"configs/{cfg_name}",
            "--max_iterations", "2",
            "data.dataset=synthetic",
            "data.batch_size=4", "data.labeled_bs=2", "data.labeled_num=2",
            "data.num_workers=2",
            "data.patch_size_3d=[16,16,16]",
            "model.n_filters_3d=4", "model.dtype=float32",
            "optim.remat=false", "parallel.num_devices=4",
            "eval.eval_every=100",
            f"run.snapshot_root={tmp_path}", "run.log_every=1",
            "run.checkpoint_every=100",
            *extra]
    if method:
        argv += ["--method", method]
    old = sys.argv
    sys.argv = argv
    try:
        main()
    finally:
        sys.argv = old


def _find_metrics(root):
    for dirpath, _, files in os.walk(root):
        if "metrics.jsonl" in files:
            return os.path.join(dirpath, "metrics.jsonl")
    return None


def test_la_chap_config_smoke(tmp_path):
    _run_cli(tmp_path, "la_chap.yml")
    assert _find_metrics(tmp_path)


def test_pancreas_chap_config_smoke(tmp_path):
    _run_cli(tmp_path, "pancreas_chap.yml")
    assert _find_metrics(tmp_path)


def test_brats_supervised_config_smoke(tmp_path):
    _run_cli(tmp_path, "brats_supervised.yml", method="supervised")
    assert _find_metrics(tmp_path)
