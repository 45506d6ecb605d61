"""Exactness tests for the space-to-depth TPU fast path (ops/s2d.py).

The s2d stem is a pure layout/weight-rearrangement transform: with identical
parameters, VNet(s2d_stem=True) must equal VNet(s2d_stem=False) to float
tolerance, in eval AND train mode (including BatchNorm batch-statistics
updates), for every decoder up_type. Capability context: the reference's 3D
path (vnet.py:8-336); the transform itself is TPU-native engineering with no
reference analog.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chap_tpu.models.vnet3d import VNet, DualDecoder3d
from chap_tpu.ops.s2d import (conv3d, depth_to_space_3d, s2d_conv_kernel,
                              s2d_deconv_kernel, s2d_down_kernel,
                              s2d_pointwise_kernel, space_to_depth_3d)

RNG = np.random.RandomState(0)


def test_s2d_roundtrip():
    x = jnp.asarray(RNG.rand(2, 8, 12, 10, 3), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space_3d(space_to_depth_3d(x))), np.asarray(x))


@pytest.mark.parametrize("k,ci,co", [(3, 1, 16), (3, 16, 16), (5, 4, 8)])
def test_s2d_conv_kernel_exact(k, ci, co):
    x = jnp.asarray(RNG.randn(2, 8, 12, 10, ci), jnp.float32)
    w = jnp.asarray(RNG.randn(k, k, k, ci, co) * 0.2, jnp.float32)
    ref = conv3d(x, w)
    got = depth_to_space_3d(conv3d(space_to_depth_3d(x), s2d_conv_kernel(w)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_s2d_down_and_pointwise_exact():
    x = jnp.asarray(RNG.randn(2, 8, 12, 10, 16), jnp.float32)
    wd = jnp.asarray(RNG.randn(2, 2, 2, 16, 32) * 0.2, jnp.float32)
    ref = conv3d(x, wd, (2, 2, 2), "VALID")
    got = conv3d(space_to_depth_3d(x), s2d_down_kernel(wd))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    wp = jnp.asarray(RNG.randn(1, 1, 1, 16, 2) * 0.2, jnp.float32)
    ref = conv3d(x, wp)
    got = depth_to_space_3d(conv3d(space_to_depth_3d(x), s2d_pointwise_kernel(wp)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_s2d_deconv_matches_flax_convtranspose():
    import flax.linen as nn
    m = nn.ConvTranspose(16, (2, 2, 2), strides=(2, 2, 2))
    x = jnp.asarray(RNG.randn(2, 4, 6, 5, 32), jnp.float32)
    vs = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(vs, x)
    got = depth_to_space_3d(
        conv3d(x, s2d_deconv_kernel(vs["params"]["kernel"]))
        + jnp.tile(vs["params"]["bias"], 8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def _init_and_apply(model, x, train):
    vs = model.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, x, train=False)
    if train:
        out, mut = model.apply(vs, x, train=True, mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(2)})
        return vs, out, mut["batch_stats"]
    return vs, model.apply(vs, x, train=False), None


@pytest.mark.parametrize("train", [False, True])
def test_vnet_s2d_stem_equals_plain(train):
    x = jnp.asarray(RNG.randn(2, 16, 16, 8, 1), jnp.float32)
    plain = VNet(num_classes=2, normalization="batchnorm", s2d_stem=False)
    fast = VNet(num_classes=2, normalization="batchnorm", s2d_stem=True)
    vs_p, out_p, bs_p = _init_and_apply(plain, x, train)
    # identical param tree by construction -> reuse plain params directly
    vs_f = vs_p
    if train:
        out_f, mut = fast.apply(vs_f, x, train=True, mutable=["batch_stats"],
                                rngs={"dropout": jax.random.PRNGKey(2)})
        bs_f = mut["batch_stats"]
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                    atol=2e-5), bs_p, bs_f)
    else:
        out_f = fast.apply(vs_f, x, train=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p), atol=5e-4)


def test_dualdecoder3d_s2d_stem_equals_plain():
    x = jnp.asarray(RNG.randn(2, 16, 16, 16, 1), jnp.float32)
    plain = DualDecoder3d(num_classes=2, normalization="batchnorm", s2d_stem=False)
    fast = DualDecoder3d(num_classes=2, normalization="batchnorm", s2d_stem=True)
    vs = plain.init(jax.random.PRNGKey(0), x, train=False)
    o1p, o2p = plain.apply(vs, x, train=False)
    o1f, o2f = fast.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(o1f), np.asarray(o1p), atol=5e-4)
    np.testing.assert_allclose(np.asarray(o2f), np.asarray(o2p), atol=5e-4)


def test_s2d_stem_falls_back_on_odd_dims():
    """The s2d gate is trace-time (vnet3d.VEncoder): odd spatial dims route
    through the plain stem with the SAME params and identical outputs.

    Full VNet forward needs matched up/skip sizes so odd dims are unusable in
    EITHER path; the gate is therefore exercised at the encoder level, where
    odd dims survive the stride-2 VALID downs (17 -> 8 -> ...)."""
    from chap_tpu.models.vnet3d import VEncoder
    x = jnp.asarray(RNG.randn(1, 17, 16, 15, 1), jnp.float32)
    plain = VEncoder(normalization="batchnorm", s2d_stem=False)
    fast = VEncoder(normalization="batchnorm", s2d_stem=True)
    vs = plain.init(jax.random.PRNGKey(0), x, train=False)
    feats_p = plain.apply(vs, x, train=False)
    feats_f = fast.apply(vs, x, train=False)  # gate falls back -> same tree
    assert [f.shape for f in feats_f] == [f.shape for f in feats_p]
    for a, b in zip(feats_f, feats_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("k,ci,co", [(3, 16, 32), (3, 32, 32), (5, 4, 8)])
def test_s2d_out_conv_kernel_exact(k, ci, co):
    """s2d_out_conv_kernel: the stride-2 kernel-(k+1) conv must equal
    s2d(conv_k(x)) exactly (trace-time weight rearrangement, no approx)."""
    from chap_tpu.ops.s2d import s2d_out_conv_kernel
    x = jnp.asarray(RNG.randn(2, 8, 12, 10, ci), jnp.float32)
    w = jnp.asarray(RNG.randn(k, k, k, ci, co) * 0.2, jnp.float32)
    ref = space_to_depth_3d(conv3d(x, w))
    r = (k - 1) // 2
    got = conv3d(x, s2d_out_conv_kernel(w), (2, 2, 2), [(r, r)] * 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("train", [False, True])
def test_vnet_s2d_stage2_equals_plain(train):
    """Stage-2 s2d residency (k4s2 fused convs + pointwise two_dw/seven_up)
    is an exact transform: identical params, equal outputs AND batch-stats."""
    x = jnp.asarray(RNG.randn(2, 16, 16, 8, 1), jnp.float32)
    plain = VNet(num_classes=2, normalization="batchnorm", s2d_stem=True,
                 s2d_stage2=False)
    fast = VNet(num_classes=2, normalization="batchnorm", s2d_stem=True,
                s2d_stage2=True)
    vs_p, out_p, bs_p = _init_and_apply(plain, x, train)
    if train:
        out_f, mut = fast.apply(vs_p, x, train=True, mutable=["batch_stats"],
                                rngs={"dropout": jax.random.PRNGKey(2)})
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                    atol=2e-5),
            bs_p, mut["batch_stats"])
    else:
        out_f = fast.apply(vs_p, x, train=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p), atol=5e-4)


def test_dualdecoder3d_s2d_stage2_equals_plain():
    """DualDecoder3d: the interpolating decoder1 falls back via
    depth_to_space on the s2d x2 skip; the deconv decoder2 stays resident —
    both must match the plain model with the same params."""
    x = jnp.asarray(RNG.randn(2, 16, 16, 16, 1), jnp.float32)
    plain = DualDecoder3d(num_classes=2, normalization="batchnorm",
                          s2d_stem=True, s2d_stage2=False)
    fast = DualDecoder3d(num_classes=2, normalization="batchnorm",
                         s2d_stem=True, s2d_stage2=True)
    vs = plain.init(jax.random.PRNGKey(0), x, train=False)
    o1p, o2p = plain.apply(vs, x, train=False)
    o1f, o2f = fast.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(o1f), np.asarray(o1p), atol=5e-4)
    np.testing.assert_allclose(np.asarray(o2f), np.asarray(o2p), atol=5e-4)


def test_s2d_stage2_perturb_forward_matches_plain():
    """The CHAP channel-dropout forward through phase views: identical rng ->
    identical perturbation semantics in both layouts."""
    x = jnp.asarray(RNG.randn(2, 16, 16, 16, 1), jnp.float32)
    kw = dict(num_classes=2, normalization="batchnorm", s2d_stem=True)
    plain = DualDecoder3d(s2d_stage2=False, **kw)
    fast = DualDecoder3d(s2d_stage2=True, **kw)
    vs = plain.init(jax.random.PRNGKey(0), x, train=False)
    rngs = {"perturb": jax.random.PRNGKey(7)}
    o1p, o2p = plain.apply(vs, x, train=False, dropout_level=[0, 1, 2, 3, 4],
                           rngs=rngs)
    o1f, o2f = fast.apply(vs, x, train=False, dropout_level=[0, 1, 2, 3, 4],
                          rngs=rngs)
    np.testing.assert_allclose(np.asarray(o1f), np.asarray(o1p), atol=5e-4)
    np.testing.assert_allclose(np.asarray(o2f), np.asarray(o2p), atol=5e-4)


@pytest.mark.parametrize("factor", [2, 4])
def test_zpack_conv_kernel_exact(factor):
    """zpack_conv_kernel: the stride-(1,1,f) packed conv + contiguous
    unpack reshape must equal the plain SAME conv exactly."""
    from chap_tpu.ops.s2d import zpack_conv_kernel, zpack_unpack
    ci, co = 5, 7
    x = jnp.asarray(RNG.randn(2, 6, 5, 8, ci), jnp.float32)
    w = jnp.asarray(RNG.randn(3, 3, 3, ci, co) * 0.2, jnp.float32)
    ref = conv3d(x, w, padding=[(1, 1)] * 3)
    y = conv3d(x, zpack_conv_kernel(w, factor), (1, 1, factor),
               [(1, 1)] * 3)
    got = zpack_unpack(y, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_vnet_zpack_stage2_equals_plain():
    """zpack_stage2 (stride-(1,1,4) packed 32-ch stage convs) is an exact
    transform: identical params, equal outputs."""
    x = jnp.asarray(RNG.randn(2, 16, 16, 8, 1), jnp.float32)
    plain = VNet(num_classes=2, normalization="batchnorm", s2d_stem=True,
                 zpack_stage2=False)
    fast = VNet(num_classes=2, normalization="batchnorm", s2d_stem=True,
                zpack_stage2=True)
    vs = plain.init(jax.random.PRNGKey(0), x, train=False)
    out_p = plain.apply(vs, x, train=False)
    out_f = fast.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p), atol=5e-4)
