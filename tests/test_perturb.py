"""Direct semantics tests of the channel-perturbation engine
(chap_tpu.models.perturb vs FilterDropout.py behavior)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chap_tpu.models.perturb import (
    _channel_dropout,
    perform_dropout,
    scores_dropout_v2,
)


def feats(b=8, c=16, hw=8, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (b, hw, hw, c)) + 3.0


def test_labeled_half_passes_clean():
    f = [feats(), feats(c=32, seed=1)]
    p1, p2 = perform_dropout(jax.random.PRNGKey(2), f, level=(0, 1))
    for orig, a, b in zip(f, p1, p2):
        np.testing.assert_array_equal(np.asarray(a[:4]), np.asarray(orig[:4]))
        np.testing.assert_array_equal(np.asarray(b[:4]), np.asarray(orig[:4]))
        # unlabeled halves ARE perturbed and differ between the two pyramids
        assert not np.allclose(np.asarray(a[4:]), np.asarray(orig[4:]))
        assert not np.allclose(np.asarray(a[4:]), np.asarray(b[4:]))


def test_levels_not_selected_untouched():
    f = [feats(), feats(c=32, seed=1)]
    p1, p2 = perform_dropout(jax.random.PRNGKey(2), f, level=(1,))
    np.testing.assert_array_equal(np.asarray(p1[0]), np.asarray(f[0]))
    np.testing.assert_array_equal(np.asarray(p2[0]), np.asarray(f[0]))


def test_comp_drop_masks_complementary():
    f = [feats()]
    p1, p2 = perform_dropout(jax.random.PRNGKey(3), f, level=(0,),
                             comp_drop=True)
    u = np.asarray(f[0][4:])
    a, b = np.asarray(p1[0][4:]), np.asarray(p2[0][4:])
    # complementary {0,2} masks: a + b == 2*u elementwise
    np.testing.assert_allclose(a + b, 2 * u, rtol=1e-5)
    # per-channel: each channel is either 2u (kept) or 0 (dropped)
    ratio = a / (u + 1e-9)
    per_channel = ratio.mean(axis=(1, 2))
    assert np.all((np.abs(per_channel) < 0.2) | (np.abs(per_channel - 2) < 0.2))


def test_channel_dropout_scaling():
    f = jnp.ones((4, 8, 8, 512))
    out = np.asarray(_channel_dropout(jax.random.PRNGKey(0), f, p=0.5))
    per_channel = out.mean(axis=(1, 2))  # [B, C]: 0 or 2
    kept = per_channel > 0
    np.testing.assert_allclose(per_channel[kept], 2.0, rtol=1e-6)
    # ~half the channels kept
    assert 0.4 < kept.mean() < 0.6


def test_scores_guide_drop_probability():
    """High grad-sim x activation channels must be dropped LESS often
    (sigmoid(-2z) semantics, FilterDropout.py:131-134)."""
    c = 64
    grad_sim = jnp.linspace(0.0, 1.0, c)        # channel c has high similarity
    activation = jnp.ones((6, c))
    keep_counts = np.zeros(c)
    for s in range(50):
        m1, _ = scores_dropout_v2(jax.random.PRNGKey(s), grad_sim, activation,
                                  if_comp=False) if False else \
            scores_dropout_v2(jax.random.PRNGKey(s), grad_sim, activation, False)
        keep_counts += (np.asarray(m1)[:, 0, 0, :] > 0).mean(axis=0)
    # monotone trend: top-quartile-similarity channels kept more than bottom
    assert keep_counts[-c // 4:].mean() > keep_counts[:c // 4].mean() + 10
