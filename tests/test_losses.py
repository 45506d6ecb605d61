import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chap_tpu.losses import (
    cross_entropy,
    cross_entropy_per_pixel,
    dice_loss,
    dice_loss_bcp,
    masked_cross_entropy,
    mix_loss,
    one_hot,
    soft_dice_loss_masked,
    vat_loss_2d,
)
from chap_tpu.utils.ramps import sigmoid_rampup


def test_sigmoid_rampup_endpoints():
    assert float(sigmoid_rampup(0, 50)) == pytest.approx(np.exp(-5.0), rel=1e-5)
    assert float(sigmoid_rampup(50, 50)) == pytest.approx(1.0)
    assert float(sigmoid_rampup(100, 50)) == pytest.approx(1.0)
    assert sigmoid_rampup(10, 0) == 1.0


def test_one_hot():
    labels = jnp.array([[0, 1], [2, 3]])
    oh = one_hot(labels, 4)
    assert oh.shape == (2, 2, 4)
    np.testing.assert_allclose(np.asarray(oh.sum(-1)), 1.0)
    assert oh[0, 1, 1] == 1.0


def test_dice_loss_perfect_prediction():
    labels = jnp.array([[[0, 1], [1, 0]]])
    probs = one_hot(labels, 2)
    assert float(dice_loss(probs, labels, 2)) == pytest.approx(0.0, abs=1e-4)


def test_dice_loss_worst_case():
    labels = jnp.zeros((1, 4, 4), dtype=jnp.int32)
    probs = one_hot(jnp.ones((1, 4, 4), dtype=jnp.int32), 2)
    assert float(dice_loss(probs, labels, 2)) == pytest.approx(1.0, abs=1e-4)


def test_dice_loss_bcp_mask_restricts():
    labels = jnp.zeros((1, 4, 4), dtype=jnp.int32)
    # prediction correct in left half, wrong in right half
    pred_labels = jnp.concatenate(
        [jnp.zeros((1, 4, 2), jnp.int32), jnp.ones((1, 4, 2), jnp.int32)], axis=2)
    probs = one_hot(pred_labels, 2)
    left_mask = jnp.concatenate([jnp.ones((1, 4, 2)), jnp.zeros((1, 4, 2))], axis=2)
    right_mask = 1 - left_mask
    assert float(dice_loss_bcp(probs, labels, left_mask, 2)) == pytest.approx(0.0, abs=1e-4)
    assert float(dice_loss_bcp(probs, labels, right_mask, 2)) == pytest.approx(1.0, abs=1e-4)


def test_cross_entropy_matches_manual():
    logits = jnp.array([[[2.0, 0.0], [0.0, 3.0]]])  # [1,2,2]
    labels = jnp.array([[0, 1]])
    ce = cross_entropy_per_pixel(logits, labels)
    expected0 = -np.log(np.exp(2.0) / (np.exp(2.0) + 1.0))
    expected1 = -np.log(np.exp(3.0) / (np.exp(3.0) + 1.0))
    np.testing.assert_allclose(np.asarray(ce[0]), [expected0, expected1], rtol=1e-4)
    assert float(cross_entropy(logits, labels)) == pytest.approx(
        (expected0 + expected1) / 2, rel=1e-4)


def test_masked_cross_entropy_zero_mask():
    logits = jnp.ones((1, 2, 2, 3))
    labels = jnp.zeros((1, 2, 2), jnp.int32)
    assert float(masked_cross_entropy(logits, labels, jnp.zeros((1, 2, 2)))) == pytest.approx(0.0)


def test_soft_dice_loss_masked_identical():
    probs = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4)), axis=-1)
    mask = jnp.ones((2, 8, 8))
    assert float(soft_dice_loss_masked(probs, probs, mask)) < 0.25  # p*p vs p^2+p^2 -> 0.5ish per class offset
    # disjoint one-hots give loss ~1
    a = one_hot(jnp.zeros((1, 4, 4), jnp.int32), 2)
    b = one_hot(jnp.ones((1, 4, 4), jnp.int32), 2)
    assert float(soft_dice_loss_masked(a, b, jnp.ones((1, 4, 4)))) == pytest.approx(1.0, abs=1e-4)


def test_mix_loss_weight_swap():
    key = jax.random.PRNGKey(1)
    logits = jax.random.normal(key, (2, 8, 8, 4))
    img_l = jnp.zeros((2, 8, 8), jnp.int32)
    patch_l = jnp.ones((2, 8, 8), jnp.int32)
    mask = jnp.ones((2, 8, 8)).at[:, :4].set(0)
    li_l, lp_l, tot_l = mix_loss(logits, img_l, patch_l, mask, 4, unlab=False)
    li_u, lp_u, tot_u = mix_loss(logits, img_l, patch_l, mask, 4, unlab=True)
    # unlab swaps image/patch weights: image term halves, patch term doubles
    assert float(li_u) == pytest.approx(float(li_l) * 0.5, rel=1e-5)
    assert float(lp_u) == pytest.approx(float(lp_l) * 2.0, rel=1e-5)
    assert float(tot_l) == pytest.approx(float(li_l) + float(lp_l), rel=1e-5)


def test_vat_loss_runs_and_positive():
    # toy "model": a fixed linear map with two heads
    w1 = jax.random.normal(jax.random.PRNGKey(2), (1, 4)) * 2
    w2 = jax.random.normal(jax.random.PRNGKey(3), (1, 4)) * 2

    def apply_fn(x):
        return x @ w1, x @ w2

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 1))
    l1, l2 = apply_fn(x)
    soft1 = jax.nn.softmax(l1, axis=-1)
    soft2 = jax.nn.softmax(l2, axis=-1)
    mask = jnp.ones((2, 8, 8))
    loss = vat_loss_2d(apply_fn, x, soft1, soft2, mask, jax.random.PRNGKey(5),
                       xi=10.0, epi=6.0, losstype="kl")
    assert float(loss) > 0.0
    loss_dice = vat_loss_2d(apply_fn, x, soft1, soft2, mask, jax.random.PRNGKey(5),
                            xi=10.0, epi=6.0, losstype="dice")
    assert float(loss_dice) > 0.0
    # jittable
    jitted = jax.jit(lambda x, r: vat_loss_2d(apply_fn, x, soft1, soft2, mask, r))
    assert float(jitted(x, jax.random.PRNGKey(6))) > 0.0


def test_vat_power_iteration_finds_adversarial_direction():
    """The VAT direction after power iteration must yield a larger divergence
    than random directions of the same radius (the point of the method)."""
    w1 = jax.random.normal(jax.random.PRNGKey(2), (1, 4)) * jnp.array([[5., 0.1, 0.1, 0.1]])
    w2 = w1 * 1.1

    def apply_fn(x):
        return x @ w1, x @ w2

    x = jax.random.normal(jax.random.PRNGKey(4), (4, 16, 16, 1))
    l1, l2 = apply_fn(x)
    soft1 = jax.nn.softmax(l1, axis=-1)
    soft2 = jax.nn.softmax(l2, axis=-1)
    mask = jnp.ones((4, 16, 16))

    vat = float(vat_loss_2d(apply_fn, x, soft1, soft2, mask,
                            jax.random.PRNGKey(5), xi=10.0, epi=6.0))

    from chap_tpu.losses.vat import l2_normalize_batch, _divergence
    rand_divs = []
    for s in range(8):
        d = l2_normalize_batch(
            jax.random.uniform(jax.random.PRNGKey(100 + s), x.shape) - 0.5)
        a1, a2 = apply_fn(x + 6.0 * d)
        rand_divs.append(float(_divergence(a1, a2, soft1, soft2, mask, "kl")))
    assert vat > max(rand_divs)


def test_worst_case_estimation_loss_semantics():
    """Reconstructed WorstCaseEstimationLoss (train_share_encoder_2D.py:197,
    constructed-only in the reference): labeled term rewards agreement with
    the main head, unlabeled term rewards DISagreement — an adversarial head
    that copies the main head on unlabeled data must cost MORE than one that
    contradicts it."""
    import jax
    import jax.numpy as jnp
    from chap_tpu.losses import WorstCaseEstimationLoss

    rng = np.random.RandomState(0)
    y_l = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32) * 3)
    y_u = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32) * 3)
    crit = WorstCaseEstimationLoss("ce")

    agree = crit(y_l, y_l, y_u, y_u)                 # adv == main everywhere
    disagree_u = crit(y_l, y_l, y_u, -y_u)           # adv contradicts on unlabeled
    assert float(disagree_u) < float(agree)
    disagree_l = crit(y_l, -y_l, y_u, -y_u)          # ...and flips labeled too
    assert float(disagree_l) > float(disagree_u)     # labeled term punishes it

    # mse labeled variant runs and differentiates
    crit_mse = WorstCaseEstimationLoss("mse")
    g = jax.grad(lambda a: crit_mse(y_l, a, y_u, y_u))(y_l)
    assert np.isfinite(np.asarray(g)).all()

    import pytest
    with pytest.raises(ValueError):
        WorstCaseEstimationLoss("dice")
