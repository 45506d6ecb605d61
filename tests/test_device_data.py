"""Device-resident input pipeline (data/device_data.py): on-device
augmentation parity with the host RandomGenerator recipe, two-stream batch
layout, and pool round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import rotate

from chap_tpu.data.device_data import (DevicePool, apply_augment,
                                       build_device_batch_fn,
                                       build_device_pool)


def _rand_img(h=32, w=32, seed=0):
    r = np.random.RandomState(seed)
    img = r.rand(h, w).astype(np.float32)
    lab = r.randint(0, 4, (h, w)).astype(np.uint8)
    return img, lab


@pytest.mark.parametrize("k", [0, 1, 2, 3])
@pytest.mark.parametrize("ax", [0, 1])
def test_rot_flip_exact(k, ax):
    """Mode 0 must reproduce np.flip(np.rot90(x, k), ax) EXACTLY — the
    transforms.py:17-24 path is pure index permutation."""
    img, lab = _rand_img()
    oi, ol = apply_augment(jnp.asarray(img), jnp.asarray(lab), 0, k, ax, 0.0)
    np.testing.assert_array_equal(np.asarray(oi), np.flip(np.rot90(img, k), ax))
    np.testing.assert_array_equal(np.asarray(ol), np.flip(np.rot90(lab, k), ax))


@pytest.mark.parametrize("deg", [-19, -7, 5, 19])
def test_rotation_matches_scipy_nearest(deg):
    """Mode 1 vs scipy.ndimage.rotate(order=0, reshape=False): same inverse
    affine map, same [0, size-1] extent cutoff, same round-half-up nearest —
    exact parity up to f32-vs-f64 coordinate rounding on a thin boundary set
    (assert >=99.9% pixels, and allow zero slack at the probed angles)."""
    img, lab = _rand_img(48, 48, seed=3)
    ang = np.deg2rad(deg)
    oi, _ = apply_augment(jnp.asarray(img), jnp.asarray(lab), 1, 0, 0,
                          jnp.float32(ang))
    ref = rotate(img, deg, order=0, reshape=False, mode="constant")
    agree = float(np.mean(np.asarray(oi) == ref))
    assert agree >= 0.999, f"pixel agreement {agree:.5f}"


def test_identity_mode():
    img, lab = _rand_img()
    oi, ol = apply_augment(jnp.asarray(img), jnp.asarray(lab), 2, 3, 1, 0.5)
    np.testing.assert_array_equal(np.asarray(oi), img)
    np.testing.assert_array_equal(np.asarray(ol), lab)


def test_batch_fn_layout_and_streams():
    """Batch layout [labeled ; unlabeled]: with augment off, every row must
    be an exact pool row from the correct index range."""
    n, h, w = 20, 16, 16
    r = np.random.RandomState(0)
    # give every row a unique fingerprint in pixel [0,0]
    images = np.arange(n, dtype=np.float32)[:, None, None] * np.ones((n, h, w), np.float32)
    labels = r.randint(0, 4, (n, h, w)).astype(np.uint8)
    pool = DevicePool(jnp.asarray(images), jnp.asarray(labels))
    num_labeled = 6
    batch_fn = build_device_batch_fn(n, num_labeled, batch_size=8,
                                     labeled_bs=4, augment=False)
    batch = batch_fn(pool, jax.random.PRNGKey(7))
    assert batch["image"].shape == (8, h, w, 1)
    assert batch["label"].shape == (8, h, w)
    assert batch["label"].dtype == jnp.uint8
    ids = np.asarray(batch["image"][:, 0, 0, 0]).astype(int)
    assert all(0 <= i < num_labeled for i in ids[:4]), ids
    assert all(num_labeled <= i < n for i in ids[4:]), ids
    for row, i in enumerate(ids):
        np.testing.assert_array_equal(np.asarray(batch["label"][row]), labels[i])


def test_batch_fn_augmented_draws_differ():
    n, h, w = 10, 16, 16
    images = np.random.RandomState(1).rand(n, h, w).astype(np.float32)
    labels = (images > 0.5).astype(np.uint8)
    pool = DevicePool(jnp.asarray(images), jnp.asarray(labels))
    batch_fn = build_device_batch_fn(n, 5, batch_size=6, labeled_bs=3)
    b1 = batch_fn(pool, jax.random.PRNGKey(0))
    b2 = batch_fn(pool, jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(b1["image"]), np.asarray(b2["image"]))


def test_build_pool_resizes_and_strips_transform():
    class Ds:
        transform = object()  # must be bypassed during pool build

        def __len__(self):
            return 3

        def __getitem__(self, i):
            assert self.transform is None, "pool build must bypass transform"
            r = np.random.RandomState(i)
            return {"image": r.rand(20, 24).astype(np.float32),
                    "label": r.randint(0, 3, (20, 24))}

    ds = Ds()
    saved_transform = ds.transform
    pool = build_device_pool(ds, (16, 16), jnp.float32)
    assert pool.images.shape == (3, 16, 16)
    assert pool.labels.shape == (3, 16, 16)
    assert pool.labels.dtype == jnp.uint8
    assert ds.transform is saved_transform  # restored after build
