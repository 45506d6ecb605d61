"""CycleGAN-era legacy zoo (networks_other.py:260-525) — shape/semantics
tests. These classes are unreferenced by any reference trainer/test path;
kept for strict zoo-surface parity."""
import jax
import jax.numpy as jnp
import numpy as np

from chap_tpu.models.gan_legacy import (GANLoss, NLayerDiscriminator,
                                        ResnetGenerator, UnetGenerator,
                                        gan_loss)


def test_gan_loss_semantics():
    pred = jnp.asarray([[0.9, 0.1], [0.8, 0.2]])
    # lsgan: MSE against constant target
    np.testing.assert_allclose(float(gan_loss(pred, True)),
                               float(jnp.mean((pred - 1.0) ** 2)), rtol=1e-6)
    np.testing.assert_allclose(float(gan_loss(pred, False)),
                               float(jnp.mean(pred ** 2)), rtol=1e-6)
    # vanilla: BCE, lower when predictions match the target side
    crit = GANLoss(use_lsgan=False)
    confident_real = jnp.asarray([[0.9, 0.8], [0.85, 0.95]])
    assert float(crit(confident_real, True)) < float(crit(confident_real, False))


def test_resnet_generator_shapes():
    m = ResnetGenerator(output_nc=3, ngf=8, n_blocks=2)
    x = jnp.zeros((1, 32, 32, 3))
    vs = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(vs, x, train=False)
    assert y.shape == (1, 32, 32, 3)
    assert float(jnp.abs(y).max()) <= 1.0          # tanh head


def test_unet_generator_shapes():
    m = UnetGenerator(output_nc=3, num_downs=5, ngf=8)
    x = jnp.zeros((1, 32, 32, 3))                  # 2^5 = 32 -> 1 bottleneck
    vs = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(vs, x, train=False)
    assert y.shape == (1, 32, 32, 3)
    assert float(jnp.abs(y).max()) <= 1.0


def test_nlayer_discriminator_patch_output():
    m = NLayerDiscriminator(ndf=8, n_layers=3)
    x = jnp.zeros((2, 64, 64, 3))
    vs = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(vs, x, train=False)
    # PatchGAN: spatial map of logits, ~1/8 resolution (2 strided + 2 k4s1)
    assert y.ndim == 4 and y.shape[0] == 2 and y.shape[-1] == 1
    assert 4 <= y.shape[1] <= 8

    sig = NLayerDiscriminator(ndf=8, n_layers=3, use_sigmoid=True)
    vs = sig.init(jax.random.PRNGKey(0), x, train=False)
    y = sig.apply(vs, x, train=False)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0
