import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chap_tpu.config import ModelConfig
from chap_tpu.models import net_factory, net_factory_3d
from chap_tpu.models.unet2d import DualDecoder, Encoder, UNet


def init_model(model, x, rngs=None):
    rngs = rngs or {}
    return model.init({"params": jax.random.PRNGKey(0), **rngs}, x, train=False)


def test_encoder_channel_dims():
    # parity with documented channel dims [16,32,64,128,256] (unet.py:250)
    enc = Encoder()
    x = jnp.zeros((2, 64, 64, 1))
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    feats = enc.apply(variables, x, train=False)
    shapes = [f.shape for f in feats]
    assert shapes == [(2, 64, 64, 16), (2, 32, 32, 32), (2, 16, 16, 64),
                      (2, 8, 8, 128), (2, 4, 4, 256)]


@pytest.mark.parametrize("decoder_type", ["same", "plus", "mcnet"])
def test_dualdecoder_forward(decoder_type):
    model = DualDecoder(num_classes=4, decoder_type=decoder_type)
    x = jnp.zeros((2, 64, 64, 1))
    variables = init_model(model, x)
    out1, out2 = model.apply(variables, x, train=False)
    assert out1.shape == (2, 64, 64, 4)
    assert out2.shape == (2, 64, 64, 4)
    # decoders differ (independent init) but encoder is shared
    assert "encoder" in variables["params"]
    assert "decoder1" in variables["params"] and "decoder2" in variables["params"]


def test_dualdecoder_train_mode_mutable_stats():
    model = DualDecoder(num_classes=4, decoder_type="mcnet")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    variables = init_model(model, x)
    (out1, out2), updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    assert out1.shape == (2, 32, 32, 4)
    assert "batch_stats" in updates


def test_dualdecoder_perturbed_forward():
    model = DualDecoder(num_classes=4, decoder_type="mcnet")
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 1))
    variables = init_model(model, x)
    (o1, o2), _ = model.apply(
        variables, x, train=True, dropout_level=(0, 1, 2, 3, 4),
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2), "perturb": jax.random.PRNGKey(3)})
    assert o1.shape == (4, 32, 32, 4)
    # batch halves: labeled half identical to unperturbed path is hard to assert
    # end-to-end; at least check outputs differ across decoders
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_dualdecoder_scores_perturbed_forward():
    model = DualDecoder(num_classes=4, decoder_type="mcnet")
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 1))
    variables = init_model(model, x)
    scores = [jnp.abs(jax.random.normal(jax.random.PRNGKey(i), (c,)))
              for i, c in enumerate((16, 32, 64, 128, 256))]
    (o1, o2), _ = model.apply(
        variables, x, train=True, dropout_level=(0, 1, 2, 3, 4), scores=scores,
        comp_dropout=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2), "perturb": jax.random.PRNGKey(3)})
    assert o1.shape == (4, 32, 32, 4)


def test_unet_jit_forward():
    model = UNet(num_classes=4)
    x = jnp.zeros((1, 64, 64, 1))
    variables = init_model(model, x)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)

    out = fwd(variables, x)
    assert out.shape == (1, 64, 64, 4)


def test_factory_2d_names():
    cfg = ModelConfig()
    for name in ["unet", "unetp", "dualdecoder", "acalnet", "unet_cct", "unet_urpc"]:
        m = net_factory(name, 1, 4, cfg)
        assert m is not None
    with pytest.raises(ValueError):
        net_factory("nope", 1, 4, cfg)


def test_factory_3d_vnet_forward():
    cfg = ModelConfig()
    model = net_factory_3d("vnet", 1, 2, mode="test", cfg=cfg)
    x = jnp.zeros((1, 32, 32, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 32, 32, 16, 2)


def test_factory_3d_dualdecoder_forward():
    cfg = ModelConfig()
    model = net_factory_3d("dualdecoder", 1, 2, mode="test", cfg=cfg)
    x = jnp.zeros((1, 16, 16, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    o1, o2 = model.apply(variables, x, train=False)
    assert o1.shape == (1, 16, 16, 16, 2)
    assert o2.shape == (1, 16, 16, 16, 2)


def test_factory_3d_unet3d_forward():
    cfg = ModelConfig()
    model = net_factory_3d("unet_3D", 1, 2, cfg=cfg)
    x = jnp.zeros((1, 32, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 32, 32, 32, 2)


def test_upsample_bilinear_align_corners():
    # parity against torch nn.Upsample(align_corners=True) semantics on a ramp
    from chap_tpu.models.layers import upsample2x_bilinear
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    up = upsample2x_bilinear(x)
    assert up.shape == (1, 4, 4, 1)
    # corners preserved exactly under align_corners=True
    assert float(up[0, 0, 0, 0]) == pytest.approx(0.0)
    assert float(up[0, 0, 3, 0]) == pytest.approx(1.0)
    assert float(up[0, 3, 0, 0]) == pytest.approx(2.0)
    assert float(up[0, 3, 3, 0]) == pytest.approx(3.0)
    # interior linear: row 0 is [0, 1/3, 2/3, 1]
    np.testing.assert_allclose(np.asarray(up[0, 0, :, 0]), [0, 1 / 3, 2 / 3, 1], rtol=1e-5)
