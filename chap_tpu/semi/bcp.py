"""Bidirectional copy-paste (BCP) mixing primitives.

Rebuild of generate_mask (train_ours_2D.py:91-101): a random 2/3-side patch is
zeroed in a ones-mask; images/labels are mixed as a*mask + b*(1-mask). Here the
mask is produced inside the jitted step from an explicit PRNG key (traced
offsets + static patch size -> no recompilation per position).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def generate_mask(rng: jax.Array, img_x: int, img_y: int,
                  patch_frac: float = 2.0 / 3.0) -> jnp.ndarray:
    """Returns mask [H,W] in {0,1}: 0 inside the random patch, 1 outside."""
    patch_x, patch_y = int(img_x * patch_frac), int(img_y * patch_frac)
    kx, ky = jax.random.split(rng)
    w = jax.random.randint(kx, (), 0, img_x - patch_x)
    h = jax.random.randint(ky, (), 0, img_y - patch_y)
    rows = jnp.arange(img_x)[:, None]
    cols = jnp.arange(img_y)[None, :]
    inside = ((rows >= w) & (rows < w + patch_x)
              & (cols >= h) & (cols < h + patch_y))
    return jnp.where(inside, 0, 1).astype(jnp.int32)


def mix_images(a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """a*mask + b*(1-mask); mask broadcast over batch/channel dims.

    a/b: [B,H,W,C] or [B,H,W]; mask: [H,W].
    """
    m = mask.astype(a.dtype)
    if a.ndim == 4:
        m = m[None, :, :, None]
    else:
        m = m[None, :, :]
    return a * m + b * (1 - m)
