"""Fused-pass CHAP step (optim.fused_passes): the vmapped 3-instance apply
must be the SAME math as the sequential per-pass step — same losses, same
gradients (-> same post-step params), same reconstructed running stats, same
GradSim scores — because vmap keeps BN statistics per instance and the
per-instance rng keys reproduce the sequential draws. Also covers the
gradsim_every cadence (lax.cond skip keeps scores unchanged off-cadence)."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chap_tpu.config import Config
from chap_tpu.models import net_factory
from chap_tpu.train.state import create_train_state, make_optimizer
from chap_tpu.train.step_chap import build_chap_train_step


def tiny_cfg():
    cfg = Config()
    cfg.data.num_classes = 3
    cfg.data.batch_size = 8
    cfg.data.labeled_bs = 4
    cfg.data.image_size = (32, 32)
    cfg.model.feature_chns = (4, 8, 8, 16, 16)
    cfg.semi.dropout = True
    cfg.semi.adv_noise = True
    cfg.optim.remat = False
    return cfg


def make_state_and_batch(cfg, seed=0):
    rng = jax.random.PRNGKey(seed)
    model = net_factory(cfg.model.name, cfg.data.in_chns, cfg.data.num_classes,
                        cfg.model)
    opt = make_optimizer(cfg.optim.base_lr, cfg.optim.max_iterations,
                         cfg.optim.momentum, cfg.optim.weight_decay,
                         cfg.optim.poly_power)
    sample = jnp.zeros((cfg.data.batch_size, *cfg.data.image_size, 1))
    state = create_train_state(model, rng, sample, opt,
                               sim_chns=tuple(cfg.model.feature_chns))
    # non-zero sim scores so the score-guided dropout branch is exercised
    state = state.replace(sim_scores=tuple(
        jnp.linspace(-0.5, 0.5, c) for c in cfg.model.feature_chns))
    r = np.random.RandomState(1)
    batch = {
        "image": jnp.asarray(r.rand(cfg.data.batch_size, *cfg.data.image_size,
                                    1).astype(np.float32)),
        "label": jnp.asarray(r.randint(0, cfg.data.num_classes,
                                       (cfg.data.batch_size,
                                        *cfg.data.image_size)).astype(np.uint8)),
    }
    return model, opt, state, batch


def run_step(cfg, fused: bool, seed=0):
    cfg = copy.deepcopy(cfg)
    cfg.optim.fused_passes = fused
    model, opt, state, batch = make_state_and_batch(cfg, seed)
    step = build_chap_train_step(model, opt, cfg, use_nms=False)
    out = step(state, batch, jax.random.PRNGKey(42))
    return jax.device_get(out)


def _tree_close(a, b, rtol, atol, what):
    fa, _ = jax.tree.flatten(a)
    fb, _ = jax.tree.flatten(b)
    assert len(fa) == len(fb)
    for xa, xb in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(xa, np.float64),
                                   np.asarray(xb, np.float64),
                                   rtol=rtol, atol=atol, err_msg=what)


@pytest.mark.parametrize("branches", ["both", "dropout", "adv"])
def test_fused_equals_sequential(branches):
    cfg = tiny_cfg()
    cfg.semi.dropout = branches in ("both", "dropout")
    cfg.semi.adv_noise = branches in ("both", "adv")
    out_f = run_step(cfg, fused=True)
    out_s = run_step(cfg, fused=False)
    for k in out_s.metrics:
        np.testing.assert_allclose(out_f.metrics[k], out_s.metrics[k],
                                   rtol=2e-4, atol=1e-5, err_msg=k)
    _tree_close(out_f.state.params, out_s.state.params, 2e-4, 1e-5, "params")
    _tree_close(out_f.state.batch_stats, out_s.state.batch_stats,
                2e-4, 1e-5, "batch_stats")
    _tree_close(out_f.state.sim_scores, out_s.state.sim_scores,
                2e-4, 1e-4, "sim_scores")


def test_gradsim_cadence_skips_off_steps():
    """gradsim_every=2: step 0 updates the scores, step 1 leaves them
    untouched; the cadence EMA uses decay**2 so one on-cadence update covers
    the same horizon as two per-step updates."""
    cfg = tiny_cfg()
    cfg.semi.adv_noise = False
    cfg.semi.gradsim_every = 2
    model, opt, state, batch = make_state_and_batch(cfg)
    s_init = jax.device_get(state.sim_scores)  # before donation eats `state`
    step = build_chap_train_step(model, opt, cfg, use_nms=False)
    out0 = step(state, batch, jax.random.PRNGKey(42))   # step 0: on cadence
    s0 = jax.device_get(out0.state.sim_scores)
    assert not all(np.allclose(a, b) for a, b in zip(s0, s_init))
    out1 = step(out0.state, batch, jax.random.PRNGKey(43))  # step 1: skipped
    s1 = jax.device_get(out1.state.sim_scores)
    for a, b in zip(s1, s0):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
