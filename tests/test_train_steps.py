import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chap_tpu.config import Config
from chap_tpu.models import net_factory
from chap_tpu.train.state import create_train_state, make_optimizer
from chap_tpu.train.step_chap import build_chap_train_step
from chap_tpu.train.step_supervised import build_supervised_train_step


def small_cfg(**semi_overrides):
    cfg = Config()
    cfg.data.num_classes = 4
    cfg.data.batch_size = 8
    cfg.data.labeled_bs = 4
    cfg.data.image_size = (32, 32)
    cfg.model.feature_chns = (4, 8, 16, 16, 32)
    cfg.optim.max_iterations = 100
    for k, v in semi_overrides.items():
        setattr(cfg.semi, k, v)
    return cfg


def make_batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    b = cfg.data.batch_size
    h, w = cfg.data.image_size
    label = np.zeros((b, h, w), np.int32)
    label[:, 8:24, 8:24] = 1
    label[:, 12:20, 12:20] = 2
    image = label / 3.0 + rng.normal(0, 0.1, (b, h, w))
    return {"image": jnp.asarray(image[..., None], jnp.float32),
            "label": jnp.asarray(label)}


def build(cfg):
    model = net_factory("dualdecoder", 1, cfg.data.num_classes, cfg.model)
    opt = make_optimizer(cfg.optim.base_lr, cfg.optim.max_iterations)
    sample = jnp.zeros((cfg.data.batch_size, *cfg.data.image_size, 1))
    state = create_train_state(model, jax.random.PRNGKey(0), sample, opt,
                               sim_chns=tuple(cfg.model.feature_chns))
    return model, opt, state


def test_supervised_step_decreases_loss():
    cfg = small_cfg()
    model, opt, state = build(cfg)
    step = build_supervised_train_step(model, opt, cfg, dual=True)
    batch = make_batch(cfg)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_chap_step_baseline_branch():
    cfg = small_cfg(adv_noise=False, dropout=False)
    model, opt, state = build(cfg)
    step = build_chap_train_step(model, opt, cfg, use_nms=False)
    batch = make_batch(cfg)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["fp_loss"]) == 0.0
    assert float(metrics["vat_loss"]) == 0.0
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state.step) == 2


def test_chap_step_full_branches():
    """FAST-tier flagship compile: the full-branch CHAP step (teacher pass +
    NMS + BCP + channel-dropout/GradSim + VAT) at tiny shape/batch, so the
    repo's own default suite — not only the driver dryrun — exercises the
    flagship graph."""
    cfg = small_cfg(adv_noise=True, dropout=True, comp_drop=True)
    cfg.data.batch_size = 4
    cfg.data.labeled_bs = 2
    model, opt, state = build(cfg)
    step = build_chap_train_step(model, opt, cfg, use_nms=True)
    batch = make_batch(cfg)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["fp_loss"]) > 0.0
    assert float(metrics["vat_loss"]) >= 0.0
    # GradSim scores updated away from zero init
    assert any(float(jnp.abs(s).max()) > 0 for s in state.sim_scores)


def test_chap_step_loss_decreases_over_steps():
    cfg = small_cfg(adv_noise=False, dropout=False)
    model, opt, state = build(cfg)
    step = build_chap_train_step(model, opt, cfg, use_nms=False)
    batch = make_batch(cfg)
    first = last = None
    for i in range(10):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics["bcp_loss"])
        last = float(metrics["bcp_loss"])
    assert last < first


def test_ablation_step_full_branches():
    from chap_tpu.train.step_ablation import build_ablation_train_step
    cfg = small_cfg(adv_noise=True, dropout=True)
    model, opt, state = build(cfg)
    step = build_ablation_train_step(model, opt, cfg)
    batch = make_batch(cfg)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["disagreement_ratio"]) <= 1.0
    assert float(metrics["fp_loss"]) > 0.0


def small_cfg_3d(**semi_overrides):
    cfg = Config()
    cfg.data.num_classes = 2
    cfg.data.batch_size = 4
    cfg.data.labeled_bs = 2
    cfg.data.patch_size_3d = (16, 16, 16)
    cfg.model.n_filters_3d = 4
    cfg.optim.max_iterations = 100
    cfg.optim.remat = False
    for k, v in semi_overrides.items():
        setattr(cfg.semi, k, v)
    return cfg


def make_batch_3d(cfg, seed=0):
    rng = np.random.RandomState(seed)
    b = cfg.data.batch_size
    d, h, w = cfg.data.patch_size_3d
    label = np.zeros((b, d, h, w), np.int32)
    label[:, 4:12, 4:12, 4:12] = 1
    image = label / 2.0 + rng.normal(0, 0.1, (b, d, h, w))
    return {"image": jnp.asarray(image[..., None], jnp.float32),
            "label": jnp.asarray(label)}


def build_3d(cfg):
    from chap_tpu.models import net_factory_3d
    model = net_factory_3d("dualdecoder", 1, cfg.data.num_classes,
                           mode="train", cfg=cfg.model)
    opt = make_optimizer(cfg.optim.base_lr, cfg.optim.max_iterations)
    sample = jnp.zeros((cfg.data.batch_size, *cfg.data.patch_size_3d, 1))
    nf = cfg.model.n_filters_3d
    state = create_train_state(model, jax.random.PRNGKey(0), sample, opt,
                               sim_chns=tuple(nf * m for m in (1, 2, 4, 8, 16)))
    return model, opt, state


def test_chap_step_3d_full_branches():
    """The full CHAP method in 3D: cuboid BCP + on-device 3D largest-CC NMS +
    channel-dropout/GradSim + VAT, one jitted step (VERDICT r1 item 3)."""
    from chap_tpu.semi.gradsim import VNET_LEVEL_PATHS
    cfg = small_cfg_3d(adv_noise=True, dropout=True, comp_drop=True)
    model, opt, state = build_3d(cfg)
    step = build_chap_train_step(model, opt, cfg, use_nms=True,
                                 level_paths=VNET_LEVEL_PATHS)
    batch = make_batch_3d(cfg)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["fp_loss"]) > 0.0
    assert float(metrics["vat_loss"]) >= 0.0
    # GradSim scores updated away from zero init for every VNet level
    assert all(float(jnp.abs(s).max()) > 0 for s in state.sim_scores)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state.step) == 2
    assert np.isfinite(float(metrics["loss"]))
