"""Orbax full-state checkpoint roundtrip (latest/best slots, sim_scores)."""
import jax
import jax.numpy as jnp
import numpy as np

from chap_tpu.config import Config
from chap_tpu.models import net_factory
from chap_tpu.train.state import create_train_state, make_optimizer
from chap_tpu.utils.checkpoint import CheckpointManager


def test_train_state_roundtrip(tmp_path):
    cfg = Config()
    # tiniest config that still has every state component (BN stats, momentum,
    # sim_scores): the roundtrip is about the checkpoint layer, not the model
    cfg.model.feature_chns = (2, 2, 4, 4, 8)
    model = net_factory("dualdecoder", 1, 2, cfg.model)
    opt = make_optimizer(0.01, 100)
    sample = jnp.zeros((1, 16, 16, 1))
    state = create_train_state(model, jax.random.PRNGKey(0), sample, opt,
                               sim_chns=tuple(cfg.model.feature_chns))
    state = state.replace(step=jnp.int32(7),
                          sim_scores=tuple(s + 0.5 for s in state.sim_scores))

    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save_latest(jax.device_get(state))
    assert ckpt.has("latest") and not ckpt.has("best")

    template = create_train_state(model, jax.random.PRNGKey(1), sample, opt,
                                  sim_chns=tuple(cfg.model.feature_chns))
    restored = ckpt.restore_latest(template)
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.sim_scores[0]), 0.5)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer momentum restored
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)):
        if hasattr(a, "shape"):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_meta_sidecar_roundtrip(tmp_path):
    """best-metric sidecar: layout-neutral run metadata next to the slots."""
    ckpt = CheckpointManager(str(tmp_path))
    assert ckpt.load_meta() == {}
    ckpt.save_meta({"best_metric": 0.91, "best_iteration": 400})
    ckpt2 = CheckpointManager(str(tmp_path))
    meta = ckpt2.load_meta()
    assert meta["best_metric"] == 0.91
    assert meta["best_iteration"] == 400


def test_init_save_folder_reuse_last(tmp_path):
    """--resume must land in the run dir that holds the checkpoints: fresh
    calls allocate run_0, run_1, ...; reuse_last returns the newest existing
    run instead of allocating (the round-4 30k run initially resumed into an
    empty run_1 and silently restarted from scratch)."""
    from chap_tpu.utils.launch import init_save_folder

    base = str(tmp_path)
    r0 = init_save_folder(base, "m")
    assert r0.endswith("run_0")
    r1 = init_save_folder(base, "m")
    assert r1.endswith("run_1")
    again = init_save_folder(base, "m", reuse_last=True)
    assert again == r1
    # reuse_last with no prior runs still creates run_0
    fresh = init_save_folder(str(tmp_path / "other"), "m", reuse_last=True)
    assert fresh.endswith("run_0")
