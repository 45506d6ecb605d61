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
