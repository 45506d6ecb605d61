"""Largest-connected-component pseudo-label cleanup ("NMS").

Rebuild of get_ACDC_masks / get_ACDC_2DLargestCC (train_ours_2D.py:103-144):
for each sample and each foreground class, keep only the largest connected
component of the argmax prediction.

TPU-first: the reference round-trips every sample through the host
(.detach().cpu().numpy() + skimage.label, train_ours_2D.py:114-136) — a
device->host sync in the middle of every train step. Here connected
components are computed ON DEVICE with an iterative label-propagation
(pointer-doubling style max-propagation under a while_loop): seed every
foreground pixel with its linear index, repeatedly take the 8-neighbourhood
max within the mask until fixpoint, then keep the component whose size
(scatter-add histogram) is largest. Everything stays inside the jitted step —
no host callback (which the axon TPU runtime doesn't support anyway).

A numpy host implementation with identical 8-connectivity semantics is kept
for post-processing outside jit and for parity tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

def _largest_cc_host(segmentation: np.ndarray, num_classes: int) -> np.ndarray:
    """[B,...spatial] int -> same, with per-class largest CC retained
    (full connectivity, matching skimage.measure.label's default)."""
    seg = np.asarray(segmentation)
    out = np.zeros_like(seg)
    structure = np.ones((3,) * (seg.ndim - 1), bool)
    for i in range(seg.shape[0]):
        for c in range(1, num_classes):
            mask = seg[i] == c
            if not mask.any():
                continue
            labels, n = ndimage.label(mask, structure=structure)
            if n == 0:
                continue
            sizes = np.bincount(labels.ravel())[1:]
            largest = labels == (np.argmax(sizes) + 1)
            out[i][largest] = c
    return out.astype(seg.dtype)


def _propagate_max(labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """One full-connectivity (3^ndim window) max-propagation step restricted
    to the mask.

    labels: [B, *spatial] int32 (-1 outside mask); mask: same-shape bool.
    """
    window = (1,) + (3,) * (labels.ndim - 1)
    neigh = jax.lax.reduce_window(
        labels, jnp.int32(-1), jax.lax.max,
        window_dimensions=window, window_strides=(1,) * labels.ndim,
        padding="SAME")
    return jnp.where(mask, jnp.maximum(labels, neigh), -1)


def _sweep_axes(labels: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Directional segmented-max sweeps: for every spatial axis and both
    directions, propagate each pixel's label across its ENTIRE contiguous
    foreground run in ONE associative scan (a window max-propagation moves
    information 1 pixel per step; a sweep moves it the full run length).

    Segmented-max combine on (value, reset): out.v = b.reset ? b.v
    : max(a.v, b.v); out.reset = a.reset | b.reset — associative, so
    lax.associative_scan parallelizes it in O(log n) VPU passes.

    The sweeps COMPOSE sequentially — each axis scans the labels already
    updated by the previous axis, not the original input. That makes any
    CONVEX component converge in ONE call: the row sweep spreads the
    component max M across its row's run, and every column run of a convex
    shape crosses that row wherever they share extent, so the column sweep
    delivers M everywhere. (The earlier all-from-original variant maxed four
    independent scans of the input; an on-chip round-count profile showed it
    left clean elliptical masks needing 3 sweep firings / 19 window rounds —
    scripts/profile_nms.py.)
    """
    reset = ~mask

    def shift(x, s: int, axis: int, fill):
        """x shifted by +s (s>0) or -s along axis, vacated cells = fill."""
        pad = [(0, 0)] * x.ndim
        pad[axis] = (s, 0) if s > 0 else (0, -s)
        lo = 0 if s > 0 else -s
        return jax.lax.slice_in_dim(
            jnp.pad(x, pad, constant_values=fill), lo, lo + x.shape[axis],
            axis=axis)

    def seg_scan(v, axis: int, step: int):
        """Hillis-Steele segmented max-scan: after ceil(log2(n)) doubling
        steps, v[i] = max over i's contiguous foreground run up to i (scan
        direction given by step's sign). A hand-rolled doubling loop beats
        lax.associative_scan here: every pass is a contiguous shift (pad +
        slice) instead of the scan lowering's strided odd/even slices, which
        are slow on TPU minor dims (measured 19 -> ~7 ms per 4-scan sweep on
        72x256^2, scripts/profile_nms.py)."""
        f = reset
        s = step
        n = v.shape[axis]
        # after passes s=1,2,..,2^(k-1) the lookback window is 2^k: stop once
        # it covers the axis (2^k >= n), i.e. while the NEXT pass still helps
        while abs(s) < n:
            v = jnp.where(f, v, jnp.maximum(v, shift(v, s, axis, -1)))
            f = f | shift(f, s, axis, True)
            s *= 2
        return v

    out = labels
    for axis in range(1, labels.ndim):
        out = jnp.maximum(out, seg_scan(out, axis, 1))
        out = jnp.maximum(out, seg_scan(out, axis, -1))
    return jnp.where(mask, out, -1)


def _label_mask_batch(mask: jnp.ndarray, rounds_per_sweep: int = 1,
                      rounds_per_jump: int = 24,
                      sweep_start: int = 1) -> jnp.ndarray:
    """Connected-component labels of a [B, *spatial] bool mask: each component
    gets the max linear index it contains; background = -1.

    Every while-loop round is one 3^ndim window max-propagation (cheap,
    ~1.2 ms on 72x256² v5e; mixes diagonals / across rows). Two escalating
    accelerators fire periodically (scripts/profile_nms.py for the on-chip
    phase costs behind this schedule):

      * from round `sweep_start`, every `rounds_per_sweep` rounds: full
        directional sweeps (_sweep_axes, sequential-composed Hillis-Steele
        segmented max — ~2 ms) propagate labels across ENTIRE contiguous
        foreground runs; a CONVEX component converges in one sweep, so
        clean anatomical masks finish in ~10-12 rounds (~9 ms for the whole
        72-mask batch, vs ~110 ms before the sequential/Hillis-Steele
        rework);
      * every `rounds_per_jump` rounds, a pointer-jump gather (each pixel
        adopts its representative's current label; pointer-doubling
        convergence, ~50 ms on TPU — the expensive escape hatch) bounds
        pathological serpentine/percolating components to O(log turns)
        jumps; clean masks converge long before it ever fires. Worst case
        measured (iid 30%-fill masks, which PERCOLATE under 8-connectivity
        into giant fractal components): 48 rounds / ~120 ms.

    Cadence defaults from the round-5 on-chip sweep
    (scripts/sweep_nms_cadence.py, 72x256^2): sweeping EVERY round from
    round 1 (rps=1, ss=1) beats the old (4, 2) on all three regimes —
    30/28/102 ms speckled/clean/percolating vs 35/34/147 — because the
    Hillis-Steele rework made a sweep ~2 ms (round 3's associative_scan
    sweeps were 9x dearer, which is why sweeps-every-round regressed the
    train step 2x back then). More frequent pointer jumps (rpj=12/16) are a
    large regression on the percolating case — the jump stays the rare
    escape hatch. In-step: full 2D CHAP step 378 -> 307-310 ms at gs4.
    """
    b = mask.shape[0]
    spatial = mask.shape[1:]
    n = int(np.prod(spatial))
    idx = jnp.arange(n, dtype=jnp.int32).reshape((1,) + spatial)
    labels = jnp.where(mask, jnp.broadcast_to(idx, mask.shape), -1)

    def cond(carry):
        labels, prev, _ = carry
        return jnp.any(labels != prev)

    def jump(new):
        flat = new.reshape(b, n)
        jumped = jnp.take_along_axis(flat, jnp.maximum(flat, 0), axis=1)
        return jnp.where(flat >= 0, jumped, -1).reshape(mask.shape)

    def body(carry):
        labels, _, it = carry
        new = _propagate_max(labels, mask)
        new = jax.lax.cond(
            (it >= sweep_start)
            & ((it - sweep_start) % rounds_per_sweep == 0),
            lambda x: _sweep_axes(x, mask), lambda x: x, new)
        new = jax.lax.cond(it % rounds_per_jump == rounds_per_jump - 1,
                           jump, lambda x: x, new)
        return new, labels, it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.full_like(labels, -2), jnp.int32(0)))
    return labels


def _component_sizes_matmul(flat: jnp.ndarray, num_ids: int,
                            chunk: int = 4096) -> jnp.ndarray:
    """Exact histogram of component IDs as MXU matmuls.

    A scatter-add histogram over HW+1 bins serializes on TPU (~100 ms for a
    24x256x256 batch). Factorize each ID as hi*K + lo (K = 256 lanes): the
    count of ID (hi,lo) is sum_p onehot_hi[p,hi] * onehot_lo[p,lo] — an
    einsum over pixel chunks that rides the MXU with f32 accumulation
    (exact: one-hot inputs, counts << 2^24). Background (-1) maps to an
    out-of-range hi bucket and drops out.
    """
    b, n = flat.shape
    k = 256
    num_hi = (num_ids + k - 1) // k
    n_pad = ((n + chunk - 1) // chunk) * chunk
    if n_pad != n:
        flat = jnp.pad(flat, ((0, 0), (0, n_pad - n)), constant_values=-1)
    hi = jnp.where(flat >= 0, flat // k, num_hi)     # background -> dropped
    lo = jnp.where(flat >= 0, flat % k, 0)
    hi = hi.reshape(b, -1, chunk)
    lo = lo.reshape(b, -1, chunk)

    def per_chunk(counts, inputs):
        hi_c, lo_c = inputs                            # [B, chunk]
        oh_hi = (hi_c[..., None] == jnp.arange(num_hi)).astype(jnp.bfloat16)
        oh_lo = (lo_c[..., None] == jnp.arange(k)).astype(jnp.bfloat16)
        counts = counts + jnp.einsum("bph,bpl->bhl", oh_hi, oh_lo,
                                     preferred_element_type=jnp.float32)
        return counts, None

    counts0 = jnp.zeros((b, num_hi, k), jnp.float32)
    counts, _ = jax.lax.scan(per_chunk, counts0,
                             (hi.transpose(1, 0, 2), lo.transpose(1, 0, 2)))
    return counts.reshape(b, num_hi * k)[:, :num_ids]


def _largest_id_sort(flat: jnp.ndarray) -> jnp.ndarray:
    """Per-sample id of the LARGEST component: the modal value of [B, N]
    int32 component labels (background -1 excluded), via sort + run-length
    scan — no histogram materialization at all.

    Only the argmax of the size histogram is ever consumed, so counting
    every id is wasted work: sort each row (backgrounds first), mark run
    starts, recover each position's run start with a cummax, and argmax the
    run lengths. Cost is one bitonic sort + two scans on [B, N] — in 3D
    (N ~ 1e6 ids) this replaces a ~4 TFLOP one-hot matmul histogram whose
    [B, N/256, 256] counts tensor dwarfs the actual component count.
    Tie-break matches the histogram path (smallest id wins: ascending sort
    puts the smaller id's run first and argmax takes the first maximum).
    """
    b, n = flat.shape
    s = jax.lax.sort(flat, dimension=1)
    pos = jnp.arange(n, dtype=jnp.int32)[None]
    is_start = jnp.concatenate(
        [jnp.ones((b, 1), bool), s[:, 1:] != s[:, :-1]], axis=1)
    start_idx = jax.lax.cummax(jnp.where(is_start, pos, -1), axis=1)
    run_len = jnp.where(s >= 0, pos - start_idx + 1, 0)
    p = jnp.argmax(run_len, axis=1)
    return jnp.take_along_axis(s, p[:, None], axis=1)[:, 0]


def largest_cc_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """[B, *spatial] bool -> bool mask of each sample's largest component."""
    b = mask.shape[0]
    n = int(np.prod(mask.shape[1:]))
    labels = _label_mask_batch(mask)
    flat = labels.reshape(b, n)
    largest_id = _largest_id_sort(flat)
    keep = flat == largest_id[:, None]
    return keep.reshape(mask.shape) & mask


def largest_cc_batch(segmentation: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Jit-safe per-class largest-CC cleanup of [B, *spatial] integer label
    maps (2D slices or 3D volumes).

    All foreground classes are stacked into one [(C-1)*B, *spatial] mask batch
    so a SINGLE label-propagation while_loop covers every (class, sample) pair.
    """
    b = segmentation.shape[0]
    masks = jnp.concatenate([segmentation == c for c in range(1, num_classes)])
    keep = largest_cc_mask(masks)
    out = jnp.zeros_like(segmentation)
    for ci, c in enumerate(range(1, num_classes)):
        out = jnp.where(keep[ci * b:(ci + 1) * b], c, out)
    return out


def get_masks_with_nms(logits: jnp.ndarray, num_classes: int, nms: bool = True) -> jnp.ndarray:
    """argmax pseudo-labels, optionally largest-CC cleaned (get_ACDC_masks)."""
    pseudo = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if nms:
        pseudo = largest_cc_batch(pseudo, num_classes)
    return pseudo
