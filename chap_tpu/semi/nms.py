"""Largest-connected-component pseudo-label cleanup ("NMS").

Rebuild of get_ACDC_masks / get_ACDC_2DLargestCC (train_ours_2D.py:103-144):
for each sample and each foreground class, keep only the largest connected
component of the argmax prediction. Connected components are not XLA-friendly,
so — like the reference's CPU roundtrip through skimage — this runs on host
via ``jax.pure_callback``, but BATCHED: one callback per step for the whole
batch instead of one .cpu() sync per sample/class.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage


def _largest_cc_host(segmentation: np.ndarray, num_classes: int) -> np.ndarray:
    """[B,H,W] int -> [B,H,W] int with per-class largest CC retained."""
    seg = np.asarray(segmentation)
    out = np.zeros_like(seg)
    for i in range(seg.shape[0]):
        for c in range(1, num_classes):
            mask = seg[i] == c
            if not mask.any():
                continue
            labels, n = ndimage.label(mask)
            if n == 0:
                continue
            sizes = np.bincount(labels.ravel())[1:]
            largest = (labels == (np.argmax(sizes) + 1))
            out[i][largest] = c
    return out.astype(seg.dtype)


def largest_cc_batch(segmentation: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Jit-safe batched largest-CC via host callback."""
    return jax.pure_callback(
        lambda s: _largest_cc_host(s, num_classes),
        jax.ShapeDtypeStruct(segmentation.shape, segmentation.dtype),
        segmentation,
        vmap_method="sequential",
    )


def get_masks_with_nms(logits: jnp.ndarray, num_classes: int, nms: bool = True) -> jnp.ndarray:
    """argmax pseudo-labels, optionally largest-CC cleaned (get_ACDC_masks)."""
    pseudo = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if nms:
        pseudo = largest_cc_batch(pseudo, num_classes)
    return pseudo
