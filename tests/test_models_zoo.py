"""Secondary model zoo forwards (parity breadth, SURVEY.md §2.2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chap_tpu.config import ModelConfig
from chap_tpu.models import net_factory, net_factory_3d


def test_attention_unet_3d_forward():
    model = net_factory_3d("attention_unet", 1, 2, cfg=ModelConfig())
    x = jnp.zeros((1, 32, 32, 32, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 32, 32, 32, 2)


def test_voxresnet_forward():
    model = net_factory_3d("voxresnet", 1, 2, cfg=ModelConfig())
    x = jnp.zeros((1, 16, 16, 16, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 16, 16, 16, 2)


def test_resunet_2d_forward():
    model = net_factory("resunet", 1, 4, ModelConfig())
    x = jnp.zeros((2, 64, 64, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 64, 64, 4)


def test_resunet_encoder_pyramid():
    from chap_tpu.models.resunet2d import ResNetEncoder2d
    enc = ResNetEncoder2d()
    x = jnp.zeros((1, 64, 64, 1))
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    feats = enc.apply(variables, x, train=False)
    assert [f.shape[-1] for f in feats] == [16, 32, 64, 128, 256]
    assert [f.shape[1] for f in feats] == [64, 32, 16, 8, 4]


def test_dsnet_train_and_eval():
    model = net_factory("dual_student", 1, 4, ModelConfig())
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 1))
    # init in train mode so the attention/projector/CLUB heads exist
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    o1, o2 = model.apply(variables, x, train=False)
    assert o1.shape == (2, 64, 64, 4)
    (o1, o2, dist), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(float(dist))


def test_unet_cct_and_urpc_forward():
    cfg = ModelConfig(feature_chns=(4, 8, 16, 16, 32))
    for name, n_out in [("unet_cct", 4), ("unet_urpc", 4)]:
        model = net_factory(name, 1, 4, cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "perturb": jax.random.PRNGKey(1)},
            x, train=True)
        outs, _ = model.apply(variables, x, train=True, mutable=["batch_stats"],
                              rngs={"dropout": jax.random.PRNGKey(2),
                                    "perturb": jax.random.PRNGKey(3)})
        assert len(outs) == n_out
        for o in outs:
            assert o.shape == (2, 32, 32, 4)
