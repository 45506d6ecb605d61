"""Top-k disagreement patch mask gating the VAT loss.

Rebuild of the missing ``utils.patch.create_maskV1`` contract (SURVEY.md §2.4;
call site train_ours_2D.py:371): on a scale_factor-downscaled patch grid, rank
patches by decoder disagreement + cross-pseudo-supervision "knowledge", keep
the top-k fraction, and upsample the selected patches back to a full-resolution
{0,1} spatial mask. Fully traced: static k via int(topk * num_patches),
jax.lax.top_k for the threshold.

Rank-generic: [B,H,W] maps give a 2D patch grid, [B,D,H,W] maps a 3D one
(the 3D CHAP step re-uses this for cuboid-level VAT gating).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def create_mask_v1(pseudo1: jnp.ndarray, pseudo2: jnp.ndarray,
                   knowledge: jnp.ndarray, scale_factor: int = 4,
                   topk: float = 0.1) -> jnp.ndarray:
    """pseudo1/pseudo2: [B, *spatial] integer label maps; knowledge:
    [B, *spatial] per-pixel cross-CE. Returns float mask [B, *spatial]
    selecting the top-k highest-conflict patches per sample.

    Spatial dims need not be multiples of scale_factor: the trailing
    remainder rows/cols join the last patch (via trimmed pooling grid)."""
    b = knowledge.shape[0]
    spatial = knowledge.shape[1:]
    grid = tuple(max(1, s // scale_factor) for s in spatial)
    disagree = (pseudo1 != pseudo2).astype(jnp.float32)
    score = disagree + knowledge

    # patch-average: trim each axis to grid*scale_factor, then reshape-pool
    trimmed = tuple(g * scale_factor for g in grid)
    score = score[(slice(None),) + tuple(slice(0, t) for t in trimmed)]
    pooled_shape = (b,)
    for g in grid:
        pooled_shape += (g, scale_factor)
    mean_axes = tuple(2 + 2 * i for i in range(len(grid)))
    patches = score.reshape(pooled_shape).mean(axis=mean_axes)

    n_patches = 1
    for g in grid:
        n_patches *= g
    flat = patches.reshape(b, n_patches)
    k = max(1, int(round(topk * n_patches)))
    kth = jax.lax.top_k(flat, k)[0][:, -1]
    keep = (flat >= kth[:, None]).astype(jnp.float32).reshape((b,) + grid)
    for axis in range(len(grid)):
        keep = jnp.repeat(keep, scale_factor, axis=1 + axis)
    # pad the trimmed remainder back out (nearest: extend the last patch row)
    pads = [(0, 0)] + [(0, s - t) for s, t in zip(spatial, trimmed)]
    return jnp.pad(keep, pads, mode="edge")
