"""Device-resident input: upload the slice pool to HBM once, then sample and
augment every training batch ON DEVICE — zero per-step host->device traffic.

Why this exists (round 5): the axon PJRT plugin retains every host->device
transfer payload on the host (scripts/repro_transfer_leak.py: ~payload-sized
RSS growth per transfer on every h2d path; delete()/gc/malloc_trim do not
reclaim it), which cost the round-4 24k-step run two restarts at ~6.5 MB/step.
The TPU-native fix is also the faster design: the whole ACDC-scale slice pool
is ~170 MB in bf16 — trivially HBM-resident — so the per-step "transfer"
becomes an on-device gather and the single-core host (this environment's
machine has ONE CPU) drops out of the hot loop entirely.

The reference's input stack (DataLoader workers + RandomGenerator, SURVEY.md
§2.4) is replaced by:
  * pool build: every raw slice is loaded ONCE, order-0 resized to the network
    size on host, and shipped in ONE bulk transfer (one payload leaked, total);
  * sampling: two-stream batches drawn on device with `jax.random.randint` —
    uniform with replacement over the labeled/unlabeled index ranges (the
    host TwoStreamBatchSampler shuffles without replacement within an epoch;
    with 1312 slices and 30k iterations the two are statistically equivalent,
    and the host path remains available via data.device_input=false);
  * augmentation: the RandomGenerator recipe (50% rot90+flip, elif 50%
    +/-20-degree nearest rotation — transforms.py) executed in-graph as ONE
    nearest-neighbour gather per sample. rot90/flip are exact integer index
    maps; the small-angle rotation matches scipy's order-0 constant-padding
    semantics. The pool is pre-resized, so rotation happens at network size
    rather than native size — the same augmentation family (exact for the
    synthetic protocols, whose native size IS the network size).
"""
from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class DevicePool(NamedTuple):
    """HBM-resident slice pool. images [N,H,W] compute dtype, labels [N,H,W]
    uint8 (widened on device by the train steps)."""
    images: jnp.ndarray
    labels: jnp.ndarray


def build_device_pool(dataset, image_size: Tuple[int, int], dtype,
                      sharding=None) -> DevicePool:
    """Load every raw (untransformed) slice once, resize to `image_size`
    (order-0, like the RandomGenerator tail — transforms.py:52-54), upload
    in one transfer. `dataset` must yield {'image': HxW, 'label': HxW}."""
    from chap_tpu.data.transforms import resize_slice

    n = len(dataset)
    h, w = image_size
    images = np.empty((n, h, w), np.float32)
    labels = np.empty((n, h, w), np.uint8)
    # bypass any host transform: the pool holds RAW slices; augmentation is
    # drawn fresh on device every time an index is sampled
    transform = getattr(dataset, "transform", None)
    if transform is not None:
        dataset.transform = None
    try:
        for i in range(n):
            s = dataset[i]
            img, lab = s["image"], s["label"]
            if img.shape != (h, w):
                img = resize_slice(img, (h, w), order=0)
                lab = resize_slice(lab, (h, w), order=0)
            images[i] = img
            labels[i] = lab.astype(np.uint8)
    finally:
        if transform is not None:
            dataset.transform = transform
    images_j = jnp.asarray(images, dtype=dtype)
    labels_j = jnp.asarray(labels)
    if sharding is not None:
        images_j = jax.device_put(images_j, sharding)
        labels_j = jax.device_put(labels_j, sharding)
    return DevicePool(images_j, labels_j)


def _augment_one(img: jnp.ndarray, lab: jnp.ndarray, rng: jax.Array
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One sample of the RandomGenerator recipe as a single nearest gather."""
    r_u1, r_u2, r_k, r_ax, r_ang = jax.random.split(rng, 5)
    u1 = jax.random.uniform(r_u1)
    u2 = jax.random.uniform(r_u2)
    k = jax.random.randint(r_k, (), 0, 4)
    ax = jax.random.randint(r_ax, (), 0, 2)
    ang = jnp.deg2rad(
        jax.random.randint(r_ang, (), -20, 20).astype(jnp.float32))
    # mode select (transforms.py:47-50): 50% rot+flip, elif 50% rotate
    mode = jnp.where(u1 > 0.5, 0, jnp.where(u2 > 0.5, 1, 2))
    return apply_augment(img, lab, mode, k, ax, ang)


def apply_augment(img: jnp.ndarray, lab: jnp.ndarray, mode, k, ax, ang
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Parameter-forced augmentation core (testable against the host
    transforms): mode 0 = flip(rot90(x, k), ax), mode 1 = nearest rotation by
    `ang` radians with constant-0 padding, mode 2 = identity."""
    h, w = img.shape
    ii = jnp.broadcast_to(jnp.arange(h)[:, None], (h, w))
    jj = jnp.broadcast_to(jnp.arange(w)[None, :], (h, w))

    # ---- mode 0: flip(rot90(x, k), ax) — exact integer source map ---------
    # out[i,j] = rot90(img,k)[fi,fj] with (fi,fj) the flipped output coords
    fi = jnp.where(ax == 0, h - 1 - ii, ii)
    fj = jnp.where(ax == 1, w - 1 - jj, jj)
    # np.rot90(img, k)[a, b] source indices:
    si_r = jnp.select([k == 0, k == 1, k == 2, k == 3],
                      [fi, fj, h - 1 - fi, h - 1 - fj])
    sj_r = jnp.select([k == 0, k == 1, k == 2, k == 3],
                      [fj, w - 1 - fi, w - 1 - fj, fi])

    # ---- mode 1: +/-20-degree rotation, nearest, constant-0 outside -------
    # matches scipy.ndimage.rotate(order=0, reshape=False) exactly (probed):
    # inverse map about (size-1)/2, out-of-extent beyond [0, size-1] -> cval,
    # nearest = floor(x + 0.5) (round half UP, not numpy's half-even)
    c_i, c_j = (h - 1) / 2.0, (w - 1) / 2.0
    di = ii.astype(jnp.float32) - c_i
    dj = jj.astype(jnp.float32) - c_j
    cos_a, sin_a = jnp.cos(ang), jnp.sin(ang)
    src_i = cos_a * di + sin_a * dj + c_i
    src_j = -sin_a * di + cos_a * dj + c_j
    in_bounds = ((src_i >= 0) & (src_i <= h - 1)
                 & (src_j >= 0) & (src_j <= w - 1))
    si_a = jnp.clip(jnp.floor(src_i + 0.5).astype(jnp.int32), 0, h - 1)
    sj_a = jnp.clip(jnp.floor(src_j + 0.5).astype(jnp.int32), 0, w - 1)

    si = jnp.select([mode == 0, mode == 1], [si_r, si_a], ii)
    sj = jnp.select([mode == 0, mode == 1], [sj_r, sj_a], jj)

    img_out = img[si, sj]
    lab_out = lab[si, sj]
    pad = (mode == 1) & ~in_bounds
    img_out = jnp.where(pad, jnp.zeros((), img.dtype), img_out)
    lab_out = jnp.where(pad, jnp.zeros((), lab.dtype), lab_out)
    return img_out, lab_out


class DeviceVolumePool(NamedTuple):
    """HBM-resident 3D volume pool for the patch trainers. images [N,X,Y,Z]
    compute dtype, labels [N,X,Y,Z] uint8, shapes [N,3] int32 (true per-volume
    extents inside the common padded box; volumes smaller than the patch are
    centre-padded to patch size first, matching transforms3d.random_crop_3d)."""
    images: jnp.ndarray
    labels: jnp.ndarray
    shapes: jnp.ndarray


def build_device_volume_pool(volumes, patch: Tuple[int, int, int], dtype,
                             sharding=None) -> DeviceVolumePool:
    """volumes: sequence of {'image': [X,Y,Z], 'label': [X,Y,Z]} host dicts."""
    n = len(volumes)
    shapes = np.zeros((n, 3), np.int32)
    padded_imgs, padded_labs = [], []
    for i in range(n):
        v = volumes[i]
        img = np.asarray(v["image"], np.float32)
        lab = np.asarray(v["label"], np.uint8)
        pads = [max(patch[d] - img.shape[d], 0) for d in range(3)]
        if any(pads):
            pad = [(p // 2, p - p // 2) for p in pads]
            img = np.pad(img, pad, mode="constant")
            lab = np.pad(lab, pad, mode="constant")
        shapes[i] = img.shape
        padded_imgs.append(img)
        padded_labs.append(lab)
    box = tuple(int(shapes[:, d].max()) for d in range(3))
    images = np.zeros((n, *box), np.float32)
    labels = np.zeros((n, *box), np.uint8)
    for i in range(n):
        sl = tuple(slice(0, s) for s in shapes[i])
        images[(i, *sl)] = padded_imgs[i]
        labels[(i, *sl)] = padded_labs[i]
    images_j = jnp.asarray(images, dtype=dtype)
    labels_j = jnp.asarray(labels)
    if sharding is not None:
        images_j = jax.device_put(images_j, sharding)
        labels_j = jax.device_put(labels_j, sharding)
    return DeviceVolumePool(images_j, labels_j, jnp.asarray(shapes))


def _augment_patch_3d(img: jnp.ndarray, lab: jnp.ndarray, rng: jax.Array
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RandomRotFlip recipe of transforms3d.random_rot_flip_3d on a cropped
    patch: 50% (rot90 in the XY plane, k in 0..3, then flip one of 3 axes).
    Applying it patch-wise after the crop spans the same augmentation family
    as the host path's volume-wise-then-crop order (rot/flip commute with
    cropping up to the crop position, which is uniform either way). Requires
    a square XY patch (all reference protocols: 112x112x80, 96^3)."""
    px, py, pz = img.shape
    assert px == py, "XY-rot90 augmentation needs a square XY patch"
    r_mode, r_k, r_ax = jax.random.split(rng, 3)
    do = jax.random.uniform(r_mode) > 0.5
    k = jnp.where(do, jax.random.randint(r_k, (), 0, 4), 0)
    ax = jnp.where(do, jax.random.randint(r_ax, (), 0, 3), 3)  # 3 = no flip

    ii = jnp.broadcast_to(jnp.arange(px)[:, None], (px, py))
    jj = jnp.broadcast_to(jnp.arange(py)[None, :], (px, py))
    # out = flip(rot90(x, k, axes=(0,1)), ax): source XY indices
    fi = jnp.where(ax == 0, px - 1 - ii, ii)
    fj = jnp.where(ax == 1, py - 1 - jj, jj)
    si = jnp.select([k == 0, k == 1, k == 2, k == 3],
                    [fi, fj, px - 1 - fi, px - 1 - fj])
    sj = jnp.select([k == 0, k == 1, k == 2, k == 3],
                    [fj, py - 1 - fi, py - 1 - fj, fi])
    img = img[si, sj, :]
    lab = lab[si, sj, :]
    zrev = ax == 2
    img = jnp.where(zrev, img[:, :, ::-1], img)
    lab = jnp.where(zrev, lab[:, :, ::-1], lab)
    return img, lab


def build_device_patch_fn(num_volumes: int, num_labeled: int, batch_size: int,
                          labeled_bs: int, patch: Tuple[int, int, int],
                          augment: bool = True, out_shardings=None) -> Callable:
    """Returns jitted patch_fn(pool, rng) -> {'image': [B,*patch,1], 'label':
    [B,*patch] uint8}: two-stream volume sampling (labeled ids < num_labeled)
    + uniform random crop inside each volume's true extent + RandomRotFlip,
    all on device — one 4D dynamic_slice per sample, zero h2d traffic."""
    px, py, pz = patch

    def one(pool: DevicePool, vid: jnp.ndarray, rng: jax.Array):
        r_crop, r_aug = jax.random.split(rng)
        shape = pool.shapes[vid]
        u = jax.random.uniform(r_crop, (3,))
        starts = jnp.floor(
            u * (shape - jnp.array(patch) + 1).astype(jnp.float32)
        ).astype(jnp.int32)
        img = jax.lax.dynamic_slice(
            pool.images, (vid, starts[0], starts[1], starts[2]),
            (1, px, py, pz))[0]
        lab = jax.lax.dynamic_slice(
            pool.labels, (vid, starts[0], starts[1], starts[2]),
            (1, px, py, pz))[0]
        if augment:
            img, lab = _augment_patch_3d(img, lab, r_aug)
        return img, lab

    def patch_fn(pool: DeviceVolumePool, rng: jax.Array):
        r_lab, r_unlab, r_one = jax.random.split(rng, 3)
        lab_ids = jax.random.randint(r_lab, (labeled_bs,), 0, num_labeled)
        unlab_ids = jax.random.randint(r_unlab, (batch_size - labeled_bs,),
                                       num_labeled, num_volumes)
        vids = jnp.concatenate([lab_ids, unlab_ids])
        imgs, labs = jax.vmap(one, in_axes=(None, 0, 0))(
            pool, vids, jax.random.split(r_one, batch_size))
        return {"image": imgs[..., None], "label": labs}

    return jax.jit(patch_fn, out_shardings=out_shardings)


def build_device_batch_fn(num_slices: int, num_labeled: int, batch_size: int,
                          labeled_bs: int, augment: bool = True,
                          out_shardings=None) -> Callable:
    """Returns jitted batch_fn(pool, rng) -> {'image': [B,H,W,1], 'label':
    [B,H,W] uint8} with the two-stream layout [labeled_bs ; rest unlabeled]."""

    def batch_fn(pool: DevicePool, rng: jax.Array) -> Dict[str, jnp.ndarray]:
        r_lab, r_unlab, r_aug = jax.random.split(rng, 3)
        lab_idx = jax.random.randint(r_lab, (labeled_bs,), 0, num_labeled)
        unlab_idx = jax.random.randint(r_unlab, (batch_size - labeled_bs,),
                                       num_labeled, num_slices)
        idx = jnp.concatenate([lab_idx, unlab_idx])
        imgs = pool.images[idx]
        labs = pool.labels[idx]
        if augment:
            imgs, labs = jax.vmap(_augment_one)(
                imgs, labs, jax.random.split(r_aug, batch_size))
        return {"image": imgs[..., None], "label": labs}

    return jax.jit(batch_fn, out_shardings=out_shardings)
