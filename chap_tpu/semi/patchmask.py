"""Top-k disagreement patch mask gating the VAT loss.

Rebuild of the missing ``utils.patch.create_maskV1`` contract (SURVEY.md §2.4;
call site train_ours_2D.py:371): on a scale_factor-downscaled patch grid, rank
patches by decoder disagreement + cross-pseudo-supervision "knowledge", keep
the top-k fraction, and upsample the selected patches back to a full-resolution
{0,1} spatial mask. Fully traced: static k via int(topk * num_patches),
jax.lax.top_k for the threshold.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def create_mask_v1(pseudo1: jnp.ndarray, pseudo2: jnp.ndarray,
                   knowledge: jnp.ndarray, scale_factor: int = 4,
                   topk: float = 0.1) -> jnp.ndarray:
    """pseudo1/pseudo2: [B,H,W] integer label maps; knowledge: [B,H,W]
    per-pixel cross-CE. Returns float mask [B,H,W] selecting the top-k
    highest-conflict patches per sample."""
    b, h, w = knowledge.shape
    gh, gw = h // scale_factor, w // scale_factor
    disagree = (pseudo1 != pseudo2).astype(jnp.float32)
    score = disagree + knowledge
    # patch-average via reshape (scale_factor divides H/W for the 256 grid)
    patches = score.reshape(b, gh, scale_factor, gw, scale_factor).mean(axis=(2, 4))
    flat = patches.reshape(b, gh * gw)
    k = max(1, int(round(topk * gh * gw)))
    kth = jax.lax.top_k(flat, k)[0][:, -1]
    keep = (flat >= kth[:, None]).astype(jnp.float32).reshape(b, gh, gw)
    full = jnp.repeat(jnp.repeat(keep, scale_factor, axis=1), scale_factor, axis=2)
    return full
