import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chap_tpu.semi import (
    ImageMemoryBank,
    create_mask_v1,
    generate_mask,
    init_sim_scores,
    largest_cc_batch,
    update_grad_sim,
)
from chap_tpu.semi.bcp import mix_images


def test_generate_mask_area():
    mask = generate_mask(jax.random.PRNGKey(0), 96, 96)
    zero_frac = float((mask == 0).mean())
    assert zero_frac == pytest.approx((64 * 64) / (96 * 96), rel=1e-6)
    # jittable with static dims
    m2 = jax.jit(lambda r: generate_mask(r, 96, 96))(jax.random.PRNGKey(1))
    assert m2.shape == (96, 96)


def test_mix_images_regions():
    mask = generate_mask(jax.random.PRNGKey(0), 32, 32)
    a = jnp.ones((2, 32, 32, 1))
    b = jnp.zeros((2, 32, 32, 1))
    mixed = mix_images(a, b, mask)
    np.testing.assert_array_equal(np.asarray(mixed[0, :, :, 0]), np.asarray(mask))


def test_create_mask_v1_topk_fraction():
    b, h, w = 2, 64, 64
    pseudo1 = jnp.zeros((b, h, w), jnp.int32)
    pseudo2 = jnp.zeros((b, h, w), jnp.int32).at[:, :8, :8].set(1)
    knowledge = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w)) * 0.01
    mask = create_mask_v1(pseudo1, pseudo2, knowledge, scale_factor=4, topk=0.1)
    assert mask.shape == (b, h, w)
    frac = float(mask.mean())
    # top-k keeps ~10% of patches
    assert frac == pytest.approx(0.1, abs=0.02)
    # the disagreement corner must be selected
    assert float(mask[:, :8, :8].mean()) == pytest.approx(1.0)


def test_largest_cc_batch():
    seg = np.zeros((1, 32, 32), np.int32)
    seg[0, 2:6, 2:6] = 1        # small blob class 1
    seg[0, 10:25, 10:25] = 1    # big blob class 1
    seg[0, 28:30, 28:30] = 2    # only blob class 2
    out = np.asarray(largest_cc_batch(jnp.asarray(seg), 4))
    assert out[0, 3, 3] == 0          # small blob removed
    assert out[0, 12, 12] == 1        # big blob kept
    assert out[0, 28, 28] == 2        # single class-2 blob kept


def test_largest_cc_under_jit():
    seg = jnp.zeros((2, 16, 16), jnp.int32).at[:, 4:8, 4:8].set(1)
    out = jax.jit(lambda s: largest_cc_batch(s, 4))(seg)
    assert np.asarray(out).sum() == 2 * 16


def test_largest_cc_device_matches_host():
    from chap_tpu.semi.nms import _largest_cc_host
    rng = np.random.RandomState(0)
    # random blobby segmentations across 3 classes
    seg = (rng.rand(4, 48, 48) * 6).astype(np.int32)
    seg[seg > 3] = 0
    from scipy.ndimage import grey_dilation
    seg = grey_dilation(seg, size=(1, 5, 5))  # make contiguous blobs
    got = np.asarray(largest_cc_batch(jnp.asarray(seg), 4))
    want = _largest_cc_host(seg, 4)
    np.testing.assert_array_equal(got, want)


def test_largest_id_sort_matches_matmul_histogram():
    """The two largest-component-id reductions must agree: argmax of the
    exact MXU matmul histogram (_component_sizes_matmul) == the sort+run-
    length path (_largest_id_sort) that largest_cc_mask actually uses.
    Keeps the histogram implementation referenced so the two can't silently
    diverge (both tie-break toward the smallest id)."""
    from chap_tpu.semi.nms import (_component_sizes_matmul, _label_mask_batch,
                                   _largest_id_sort)
    rng = np.random.RandomState(1)
    mask = rng.rand(3, 24, 24) > 0.55          # every sample has foreground
    labels = _label_mask_batch(jnp.asarray(mask))
    flat = labels.reshape(3, -1)
    counts = np.asarray(_component_sizes_matmul(flat, 24 * 24))
    want = counts.argmax(axis=1)
    got = np.asarray(_largest_id_sort(flat))
    np.testing.assert_array_equal(got, want)


def test_gradsim_update():
    chns = (4, 8)
    state = init_sim_scores(chns)
    assert all(np.allclose(np.asarray(s), 0) for s in state)

    def make_grads(seed):
        k = jax.random.PRNGKey(seed)
        return {"encoder": {
            "in_conv": {"Conv_1": {"kernel": jax.random.normal(k, (3, 3, 2, 4))}},
            "down1": {"ConvBlock_0": {"Conv_1": {"kernel": jax.random.normal(k, (3, 3, 4, 8))}}},
            "down2": {"ConvBlock_0": {"Conv_1": {"kernel": jnp.zeros((3, 3, 8, 8))}}},
            "down3": {"ConvBlock_0": {"Conv_1": {"kernel": jnp.zeros((3, 3, 8, 8))}}},
            "down4": {"ConvBlock_0": {"Conv_1": {"kernel": jnp.zeros((3, 3, 8, 8))}}},
        }}

    # identical gradients -> cosine 1 -> scores move toward 1
    from chap_tpu.semi.gradsim import ENCODER_LEVEL_PATHS
    import chap_tpu.semi.gradsim as gs
    old_paths = gs.ENCODER_LEVEL_PATHS
    gs.ENCODER_LEVEL_PATHS = old_paths[:2]
    try:
        new = update_grad_sim(state, make_grads(0), make_grads(0), decay=0.0)
        np.testing.assert_allclose(np.asarray(new[0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new[1]), 1.0, atol=1e-5)
    finally:
        gs.ENCODER_LEVEL_PATHS = old_paths


def test_memory_bank():
    mb = ImageMemoryBank(capacity=16, image_size=(32, 32), patch_size=8)
    images = np.random.rand(6, 32, 32).astype(np.float32)
    knowledge = np.zeros((6, 32, 32), np.float32)
    knowledge[0, 10:18, 10:18] = 5.0  # image 0 has the hardest patch
    mb.add(images, knowledge, 4)
    assert len(mb) == 4
    batch = mb.get_samples(2)
    assert batch["image"].shape == (2, 32, 32, 1)
    assert batch["mask"].shape == (2, 32, 32)
    assert batch["mask"].sum(axis=(1, 2)).max() == 64  # 8x8 patch marked
    # capacity eviction
    for _ in range(5):
        mb.add(images, knowledge, 6)
    assert len(mb) <= 16


def test_largest_cc_spiral_and_3d_match_host():
    """Sweep-based CC: a serpentine component (worst case for directional
    sweeps — information must turn many corners) and a 3D volume must still
    match the host reference exactly (the pointer-jump escape hatch bounds
    pathological shapes)."""
    from chap_tpu.semi.nms import _largest_cc_host

    # serpentine: connected S-curve + a separate small blob
    seg = np.zeros((1, 32, 32), np.int32)
    for r in range(0, 32, 4):
        seg[0, r, :] = 1                       # horizontal bars
    for i, r in enumerate(range(0, 28, 4)):    # alternating connectors
        col = 31 if i % 2 == 0 else 0
        seg[0, r:r + 5, col] = 1
    seg[0, 2, 8:11] = 0                        # (keep bars clean)
    seg[0, 30, 2:5] = 2                        # small second-class blob
    got = np.asarray(largest_cc_batch(jnp.asarray(seg), 3))
    want = _largest_cc_host(seg, 3)
    np.testing.assert_array_equal(got, want)

    rng = np.random.RandomState(3)
    vol = (rng.rand(2, 12, 12, 12) > 0.72).astype(np.int32)
    got = np.asarray(largest_cc_batch(jnp.asarray(vol), 2))
    want = _largest_cc_host(vol, 2)
    np.testing.assert_array_equal(got, want)
