"""Device-resident 3D patch pipeline (data/device_data.py volume pool):
crop correctness against the host volume, two-stream volume ids, centre-pad
parity with transforms3d.random_crop_3d, and rot-flip patch augmentation."""
import jax
import jax.numpy as jnp
import numpy as np

from chap_tpu.data.device_data import (DeviceVolumePool, _augment_patch_3d,
                                       build_device_patch_fn,
                                       build_device_volume_pool)

PATCH = (8, 8, 6)


def _volumes(n=5, shape=(12, 12, 10), seed=0):
    r = np.random.RandomState(seed)
    vols = []
    for i in range(n):
        img = r.rand(*shape).astype(np.float32) + i * 10  # volume fingerprint
        vols.append({"image": img, "label": (img % 4).astype(np.uint8)})
    return vols


def test_pool_build_and_pad_parity():
    vols = _volumes(2, (6, 14, 4))  # dims 0 and 2 smaller than the patch
    pool = build_device_volume_pool(vols, PATCH, jnp.float32)
    assert pool.images.shape[0] == 2
    # centre padding matches transforms3d.random_crop_3d: pad//2 before
    np.testing.assert_array_equal(np.asarray(pool.shapes[0]), [8, 14, 6])
    img0 = np.asarray(pool.images[0])
    ref = np.pad(vols[0]["image"], [(1, 1), (0, 0), (1, 1)], mode="constant")
    np.testing.assert_allclose(img0[:8, :14, :6], ref)


def test_patch_fn_crops_are_exact_blocks():
    vols = _volumes(5)
    pool = build_device_volume_pool(vols, PATCH, jnp.float32)
    fn = build_device_patch_fn(5, 2, batch_size=6, labeled_bs=3, patch=PATCH,
                               augment=False)
    batch = fn(pool, jax.random.PRNGKey(0))
    assert batch["image"].shape == (6, *PATCH, 1)
    assert batch["label"].shape == (6, *PATCH)
    imgs = np.asarray(batch["image"])[..., 0]
    labs = np.asarray(batch["label"])
    for b in range(6):
        vid = int(imgs[b].flat[0] // 10)   # fingerprint
        if b < 3:
            assert vid < 2, "labeled rows must come from labeled volumes"
        else:
            assert 2 <= vid < 5
        vol = vols[vid]["image"]
        # locate the crop by its corner value and verify the whole block
        corner = imgs[b][0, 0, 0]
        pos = np.argwhere(np.isclose(vol, corner))
        found = False
        for (x, y, z) in pos:
            blk = vol[x:x + PATCH[0], y:y + PATCH[1], z:z + PATCH[2]]
            if blk.shape == PATCH and np.allclose(blk, imgs[b]):
                found = True
                np.testing.assert_array_equal(
                    vols[vid]["label"][x:x + PATCH[0], y:y + PATCH[1],
                                       z:z + PATCH[2]], labs[b])
                break
        assert found, f"patch {b} is not a contiguous crop of volume {vid}"


def test_augment_patch_3d_is_rot_flip_family():
    """Over many draws the augmented patch must equal flip(rot90(x,k),ax) for
    some (k, ax) — i.e. the exact transforms3d.random_rot_flip_3d family."""
    r = np.random.RandomState(0)
    img = r.rand(6, 6, 4).astype(np.float32)
    lab = (img > 0.5).astype(np.uint8)
    candidates = []
    for k in range(4):
        rot_i = np.rot90(img, k, axes=(0, 1))
        rot_l = np.rot90(lab, k, axes=(0, 1))
        candidates.append((rot_i, rot_l))            # no flip
        for ax in range(3):
            candidates.append((np.flip(rot_i, ax), np.flip(rot_l, ax)))
    seen_nontrivial = False
    for seed in range(12):
        oi, ol = _augment_patch_3d(jnp.asarray(img), jnp.asarray(lab),
                                   jax.random.PRNGKey(seed))
        oi, ol = np.asarray(oi), np.asarray(ol)
        match = [np.allclose(oi, ci) and np.array_equal(ol, cl)
                 for ci, cl in candidates]
        assert any(match), f"seed {seed}: not in the rot-flip family"
        if not np.allclose(oi, img):
            seen_nontrivial = True
    assert seen_nontrivial, "augmentation never fired over 12 draws"
