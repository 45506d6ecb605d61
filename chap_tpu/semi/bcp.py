"""Bidirectional copy-paste (BCP) mixing primitives.

Rebuild of generate_mask (train_ours_2D.py:91-101): a random 2/3-side patch is
zeroed in a ones-mask; images/labels are mixed as a*mask + b*(1-mask). Here the
mask is produced inside the jitted step from an explicit PRNG key (traced
offsets + static patch size -> no recompilation per position).

Rank-generic: the same primitives serve the 2D trainer ([H,W] masks) and the
3D trainer ([D,H,W] masks) — the reference's 3D BCP analog (the BCP paper's
cuboid mixing) is the same construction with one more spatial axis.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def generate_mask_nd(rng: jax.Array, spatial: Sequence[int],
                     patch_frac: float = 2.0 / 3.0) -> jnp.ndarray:
    """Returns mask [*spatial] in {0,1}: 0 inside a random patch_frac-sided
    axis-aligned box, 1 outside. Box offsets are traced (no recompilation
    per position); box size is static."""
    spatial = tuple(int(s) for s in spatial)
    patch = tuple(int(s * patch_frac) for s in spatial)
    keys = jax.random.split(rng, len(spatial))
    inside = None
    for axis, (size, psize, key) in enumerate(zip(spatial, patch, keys)):
        start = jax.random.randint(key, (), 0, size - psize)
        coord = jnp.arange(size).reshape(
            tuple(size if a == axis else 1 for a in range(len(spatial))))
        in_axis = (coord >= start) & (coord < start + psize)
        inside = in_axis if inside is None else (inside & in_axis)
    return jnp.where(inside, 0, 1).astype(jnp.int32)


def generate_mask(rng: jax.Array, img_x: int, img_y: int,
                  patch_frac: float = 2.0 / 3.0) -> jnp.ndarray:
    """2D wrapper: mask [H,W] in {0,1} (train_ours_2D.py:91-101)."""
    return generate_mask_nd(rng, (img_x, img_y), patch_frac)


def mix_images(a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """a*mask + b*(1-mask); mask broadcast over batch (and channel) dims.

    a/b: [B, *spatial] or [B, *spatial, C]; mask: [*spatial].
    """
    m = mask.astype(a.dtype)[None]
    if a.ndim == mask.ndim + 2:          # trailing channel axis
        m = m[..., None]
    elif a.ndim != mask.ndim + 1:
        raise ValueError(f"rank mismatch: image {a.shape} vs mask {mask.shape}")
    return a * m + b * (1 - m)
