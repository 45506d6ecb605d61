import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chap_tpu.config import Config
from chap_tpu.models import net_factory
from chap_tpu.train.step_share import (
    build_acal_steps,
    build_share_joint_step,
    create_share_state,
    sharpening,
    _mask_grads,
)


def small_cfg():
    cfg = Config()
    cfg.data.num_classes = 4
    cfg.data.batch_size = 8
    cfg.data.labeled_bs = 4
    cfg.data.image_size = (32, 32)
    cfg.model.feature_chns = (4, 8, 16, 16, 32)
    cfg.model.decoder_type = "same"
    cfg.optim.max_iterations = 100
    cfg.semi.adv_losstype = "mse"
    return cfg


def make_batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    b = cfg.data.batch_size
    h, w = cfg.data.image_size
    label = np.zeros((b, h, w), np.int32)
    label[:, 8:24, 8:24] = 1
    image = label + rng.normal(0, 0.1, (b, h, w))
    return {"image": jnp.asarray(image[..., None], jnp.float32),
            "label": jnp.asarray(label)}


@pytest.fixture()
def setup():
    cfg = small_cfg()
    model = net_factory("acalnet", 1, 4, cfg.model)
    sample = jnp.zeros((cfg.data.batch_size, 32, 32, 1))
    state, opt_g, opt_f = create_share_state(model, jax.random.PRNGKey(0), sample, cfg)
    return cfg, model, state, opt_g, opt_f


def test_joint_step_runs(setup):
    cfg, model, state, opt_g, opt_f = setup
    step = build_share_joint_step(model, opt_g, opt_f, cfg)
    batch = make_batch(cfg)
    params_before = jax.device_get(state.params)
    state2, metrics, knowledge = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert knowledge.shape == (4, 32, 32)  # unlabeled half
    assert int(state2.step) == 1
    # all params updated (both groups)
    diff = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
                        params_before, jax.device_get(state2.params))
    leaves = jax.tree.leaves(diff)
    assert max(leaves) > 0


def test_decoder_max_step_freezes_encoder(setup):
    cfg, model, state, opt_g, opt_f = setup
    dec_step, enc_step = build_acal_steps(model, opt_g, opt_f, cfg)
    batch = make_batch(cfg)
    mask = jnp.ones((4, 32, 32))
    params_before = jax.device_get(state.params)
    state2, m = dec_step(state, batch["image"], batch["label"], mask,
                         jax.random.PRNGKey(2))
    # encoder params unchanged, decoder params changed
    enc_diff = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        params_before["encoder"], jax.device_get(state2.params["encoder"])))
    dec_diff = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        params_before["decoder1"], jax.device_get(state2.params["decoder1"])))
    assert max(enc_diff) == 0.0
    assert max(dec_diff) > 0.0


def test_encoder_min_step_freezes_decoders(setup):
    cfg, model, state, opt_g, opt_f = setup
    dec_step, enc_step = build_acal_steps(model, opt_g, opt_f, cfg)
    batch = make_batch(cfg)
    mask = jnp.ones((4, 32, 32))
    params_before = jax.device_get(state.params)
    state2, m = enc_step(state, batch["image"], mask, jax.random.PRNGKey(3))
    enc_diff = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        params_before["encoder"], jax.device_get(state2.params["encoder"])))
    dec_diff = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        params_before["decoder1"], jax.device_get(state2.params["decoder1"])))
    assert max(enc_diff) > 0.0
    assert max(dec_diff) == 0.0


def test_sharpening():
    p = jnp.array([0.6, 0.5, 0.9])
    s = sharpening(p, 0.1)
    assert float(s[1]) == pytest.approx(0.5)
    assert float(s[0]) > 0.9  # sharpened toward 1
    assert float(s[2]) > 0.999
