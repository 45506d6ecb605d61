"""Fused Pallas loss kernel vs. the pure-JAX reference implementations."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chap_tpu.losses.ce import masked_cross_entropy
from chap_tpu.losses.dice import dice_loss_bcp
from chap_tpu.ops.fused_losses import fused_masked_dice_ce, masked_seg_stats


def make_inputs(seed=0, b=2, h=64, w=64, c=4):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    logits = jax.random.normal(k1, (b, h, w, c)) * 2
    labels = jax.random.randint(k2, (b, h, w), 0, c)
    mask = jax.random.bernoulli(k3, 0.6, (b, h, w)).astype(jnp.float32)
    return logits, labels, mask


def test_stats_match_reference():
    logits, labels, mask = make_inputs()
    inter, z, y, ce_sum, m_sum = masked_seg_stats(logits, labels, mask)
    p = jax.nn.softmax(logits, axis=-1)
    t = (labels[..., None] == jnp.arange(4)).astype(jnp.float32)
    m = mask[..., None]
    np.testing.assert_allclose(np.asarray(inter),
                               np.asarray(jnp.sum(p * t * m, axis=(0, 1, 2))), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(z),
                               np.asarray(jnp.sum(p * p * m, axis=(0, 1, 2))), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(jnp.sum(t * m, axis=(0, 1, 2))), rtol=1e-4)
    assert float(m_sum) == pytest.approx(float(jnp.sum(mask)), rel=1e-5)


def test_fused_loss_matches_reference():
    logits, labels, mask = make_inputs()
    dice, ce = fused_masked_dice_ce(logits, labels, mask)
    probs = jax.nn.softmax(logits, axis=-1)
    ref_dice = dice_loss_bcp(probs, labels, mask, 4)
    ref_ce = masked_cross_entropy(logits, labels, mask)
    assert float(dice) == pytest.approx(float(ref_dice), rel=1e-4)
    assert float(ce) == pytest.approx(float(ref_ce), rel=1e-4)


def test_fused_loss_gradient_matches_reference():
    logits, labels, mask = make_inputs(seed=1, b=1, h=32, w=32)

    def fused(lg):
        d, c = fused_masked_dice_ce(lg, labels, mask)
        return d + 0.7 * c

    def ref(lg):
        probs = jax.nn.softmax(lg, axis=-1)
        return (dice_loss_bcp(probs, labels, mask, 4)
                + 0.7 * masked_cross_entropy(lg, labels, mask))

    g_fused = jax.grad(fused)(logits)
    g_ref = jax.grad(ref)(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-3, atol=1e-7)


def test_fused_loss_non_multiple_size():
    # N not a multiple of the kernel chunk
    logits, labels, mask = make_inputs(seed=2, b=1, h=23, w=29)
    dice, ce = fused_masked_dice_ce(logits, labels, mask)
    probs = jax.nn.softmax(logits, axis=-1)
    assert float(dice) == pytest.approx(float(dice_loss_bcp(probs, labels, mask, 4)), rel=1e-4)
    assert float(ce) == pytest.approx(float(masked_cross_entropy(logits, labels, mask)), rel=1e-4)
