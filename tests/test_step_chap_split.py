"""The two-program CHAP step (teacher+NMS / student update) must equal the
fused single-program step: same code paths (shared teacher_fn / student_fn),
RNG re-split deterministically in each program — asserted here numerically on
a tiny 3D shape, the mode whose fused graph OOM-killed the tunnel's remote
compiler at the full LA patch (BENCH_NOTES '3D train steps')."""
import jax
import jax.numpy as jnp
import numpy as np

from chap_tpu.config import Config
from chap_tpu.models import net_factory_3d
from chap_tpu.semi.gradsim import VNET_LEVEL_PATHS
from chap_tpu.train.state import create_train_state, make_optimizer
from chap_tpu.train.step_chap import build_chap_train_step


def _setup(patch=(16, 16, 16), batch=4):
    cfg = Config()
    cfg.data.num_classes = 2
    cfg.data.batch_size = batch
    cfg.data.labeled_bs = batch // 2
    cfg.model.n_filters_3d = 4
    cfg.semi.dropout = True
    cfg.semi.adv_noise = True
    cfg.semi.vat_iters = 1
    cfg.optim.remat = False
    model = net_factory_3d("dualdecoder", 1, 2, mode="train", cfg=cfg.model)
    opt = make_optimizer(cfg.optim.base_lr, cfg.optim.max_iterations,
                         cfg.optim.momentum, cfg.optim.weight_decay,
                         cfg.optim.poly_power)
    sample = jnp.zeros((batch, *patch, 1))
    nf = cfg.model.n_filters_3d
    state = create_train_state(model, jax.random.PRNGKey(0), sample, opt,
                               sim_chns=tuple(nf * m for m in (1, 2, 4, 8, 16)))
    rng = np.random.RandomState(0)
    batch_data = {
        "image": jnp.asarray(rng.rand(batch, *patch, 1).astype(np.float32)),
        "label": jnp.asarray((rng.rand(batch, *patch) > 0.6).astype(np.int32)),
    }
    return cfg, model, opt, state, batch_data


def test_split_step_equals_fused():
    cfg, model, opt, state, batch = _setup()
    fused = build_chap_train_step(model, opt, cfg, use_nms=True,
                                  level_paths=VNET_LEVEL_PATHS, split=False)
    two = build_chap_train_step(model, opt, cfg, use_nms=True,
                                level_paths=VNET_LEVEL_PATHS, split=True)
    rng = jax.random.PRNGKey(42)

    out_f = fused(jax.tree.map(jnp.copy, state), batch, rng)
    out_s = two(jax.tree.map(jnp.copy, state), batch, rng)

    for k in out_f.metrics:
        np.testing.assert_allclose(np.asarray(out_f.metrics[k]),
                                   np.asarray(out_s.metrics[k]),
                                   atol=1e-5, rtol=1e-5, err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4),
        out_f.state.params, out_s.state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4),
        out_f.state.sim_scores, out_s.state.sim_scores)
    assert int(out_s.state.step) == int(out_f.state.step) == 1


def test_split_step_runs_consecutive_steps():
    """Donation + batch_stats threading across the two programs survives a
    second step (the donated state must not be reused by the wrapper)."""
    cfg, model, opt, state, batch = _setup()
    two = build_chap_train_step(model, opt, cfg, use_nms=True,
                                level_paths=VNET_LEVEL_PATHS, split=True)
    rng = jax.random.PRNGKey(1)
    out = two(state, batch, rng)
    out = two(out.state, batch, jax.random.PRNGKey(2))
    assert int(out.state.step) == 2
    assert np.isfinite(float(out.metrics["loss"]))
