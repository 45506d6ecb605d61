"""Channel-perturbation engine — the "channel" half of CHAP's channel-spatial
hierarchical perturbation.

Rebuild of FilterDropout.perform_dropout / scores_dropoutV2 / drop_based_on_prob
(FilterDropout.py:45-159), as pure functions with explicit PRNG so the whole
double-decode compiles into one XLA program.

Semantics per encoder level (batch = [labeled ; unlabeled] halves):
  * only the unlabeled half is perturbed; the labeled half passes through clean
    (the reference concatenates the full batch with the perturbed half, which
    inflates the batch 1.5x and cannot feed its own loss call sites — a latent
    shape bug; here the perturbed unlabeled half REPLACES the clean one so
    batch size is preserved, which is the only consistent reading of the
    train_ours_2D.py:361-364 call sites).
  * no scores: two independent channel dropouts (p=0.5, scaled by 2), or
    complementary {0,2} Binomial masks when comp_drop.
  * scores: per-channel grad-similarity x GAP activation -> z-score ->
    sigmoid(-2z) drop probability -> (complementary) Bernoulli channel masks,
    re-scaled by numel/sum.

All branching on `level`/`comp_drop`/score-availability is static (python), so
each configuration traces to a single fused graph.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _mask_shape(feat_ndim: int, b: int, c: int) -> Tuple[int, ...]:
    """Per-(sample, channel) mask shape broadcasting over all spatial dims."""
    return (b,) + (1,) * (feat_ndim - 2) + (c,)


def _channel_dropout(rng: jax.Array, feat: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    """torch nn.Dropout2d/3d: zero whole channels w.p. p, scale kept by
    1/(1-p).

    feat: [B, *spatial, C] (2D or 3D).
    """
    shape = _mask_shape(feat.ndim, feat.shape[0], feat.shape[-1])
    keep = jax.random.bernoulli(rng, 1.0 - p, shape).astype(feat.dtype)
    return feat * keep / (1.0 - p)


def _comp_binomial_masks(rng: jax.Array, shape: Tuple[int, ...], dtype
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Complementary {0,2} channel masks (FilterDropout.py:61-68)."""
    m1 = jax.random.bernoulli(rng, 0.5, shape).astype(dtype) * 2.0
    return m1, 2.0 - m1


def _drop_based_on_prob(rng: jax.Array, drop_probs: jnp.ndarray, comp: bool,
                        feat_ndim: int = 4) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bernoulli keep-masks from per-(sample,channel) drop probabilities with
    numel/sum re-scaling (FilterDropout.py:140-159). drop_probs: [B, C];
    returned masks broadcast over feat_ndim-2 spatial dims."""
    r_branch, r1, r2 = jax.random.split(rng, 3)
    if comp:
        # the reference picks mask1~keep/mask2~drop or the swap at random
        swap = jax.random.bernoulli(r_branch, 0.5)
        base1 = jax.random.bernoulli(r1, 1.0 - drop_probs).astype(jnp.float32)
        base2 = jax.random.bernoulli(r2, drop_probs).astype(jnp.float32)
        mask1 = jnp.where(swap, base2, base1)
        mask2 = jnp.where(swap, base1, base2)
    else:
        mask1 = jax.random.bernoulli(r1, 1.0 - drop_probs).astype(jnp.float32)
        mask2 = jax.random.bernoulli(r2, 1.0 - drop_probs).astype(jnp.float32)
    numel = float(mask1.size)
    mask1 = mask1 * numel / (jnp.sum(mask1) + 1e-8)
    mask2 = mask2 * numel / (jnp.sum(mask2) + 1e-8)
    # [B, C] -> [B, 1...1, C] for channel-last broadcast
    shape = _mask_shape(feat_ndim, mask1.shape[0], mask1.shape[1])
    return mask1.reshape(shape), mask2.reshape(shape)


def scores_dropout_v2(rng: jax.Array, grad_sim: jnp.ndarray, activation: jnp.ndarray,
                      comp: bool, kind: str = "sigmoid", feat_ndim: int = 4
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Score-guided drop probabilities (FilterDropout.py:116-138).

    grad_sim: [C] per-channel gradient similarity; activation: [B, C] GAP of
    the unlabeled features. Channels whose activation-weighted similarity is
    LOW get high drop probability (sigmoid(-2z)).
    """
    scores = grad_sim[None, :] * activation
    mean = jnp.mean(scores, axis=1, keepdims=True)
    sigma = jnp.std(scores, axis=1, keepdims=True)
    if kind == "gauss":
        z = (scores - mean) / (sigma * 2.0 + 1e-8)
        probs = jnp.clip(0.5 * (1 + jax.lax.erf(z / jnp.sqrt(2.0))), 0.0, 1.0)
    else:  # sigmoid
        z = (scores - mean) / (sigma + 1e-8)
        probs = jax.nn.sigmoid(-z * 2.0)
    return _drop_based_on_prob(rng, probs, comp, feat_ndim)


def _gate_mask(mask: jnp.ndarray, gate) -> jnp.ndarray:
    """Blend a multiplicative perturbation mask toward identity: gate=1 keeps
    the perturbation, gate=0 makes the pass a clean forward. `gate` is a
    TRACED scalar, which lets one vmapped apply run perturbed and clean
    instances side by side (train/step_chap.py fused method passes) — the
    masks are per-(sample, channel), so gating costs nothing on the feature
    bandwidth."""
    if gate is None:
        return mask
    g = jnp.asarray(gate, mask.dtype)
    return g * mask + (1.0 - g)


def perform_dropout(rng: jax.Array,
                    features: Sequence[jnp.ndarray],
                    level: Sequence[int],
                    scores: Optional[Sequence[Optional[jnp.ndarray]]] = None,
                    comp_drop: bool = False,
                    gate=None,
                    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Produce two perturbed feature pyramids for the two decoders.

    features: encoder pyramid, each [B, *spatial, C] (2D or 3D) with batch =
    [labeled ; unlabeled] halves (labeled_bs = B // 2). Returns
    (pyramid1, pyramid2). `gate` (traced scalar or None): 1 = perturb,
    0 = identity passthrough (see _gate_mask).
    """
    feature_fp1: List[jnp.ndarray] = []
    feature_fp2: List[jnp.ndarray] = []
    for idx, feat in enumerate(features):
        b = feat.shape[0]
        c = feat.shape[-1]
        labeled_bs = b // 2
        lab_feat = feat[:labeled_bs]
        unlab_feat = feat[labeled_bs:]
        spatial_axes = tuple(range(1, feat.ndim - 1))
        if idx in level:
            rng, r1, r2 = jax.random.split(jax.random.fold_in(rng, idx), 3)
            score_vec = None if scores is None else scores[idx]
            if score_vec is None:
                if comp_drop:
                    m1, m2 = _comp_binomial_masks(
                        r1, _mask_shape(feat.ndim, b - labeled_bs, c), feat.dtype)
                    p1 = unlab_feat * _gate_mask(m1, gate)
                    p2 = unlab_feat * _gate_mask(m2, gate)
                else:
                    shape = _mask_shape(feat.ndim, b - labeled_bs, c)
                    k1 = jax.random.bernoulli(r1, 0.5, shape).astype(feat.dtype)
                    k2 = jax.random.bernoulli(r2, 0.5, shape).astype(feat.dtype)
                    p1 = unlab_feat * _gate_mask(k1 / 0.5, gate)
                    p2 = unlab_feat * _gate_mask(k2 / 0.5, gate)
            else:
                activation = jnp.mean(unlab_feat, axis=spatial_axes)  # GAP -> [B_u, C]
                activation = jax.lax.stop_gradient(activation)
                m1, m2 = scores_dropout_v2(r1, score_vec, activation, comp_drop,
                                           feat_ndim=feat.ndim)
                m1 = _gate_mask(m1.astype(feat.dtype), gate)
                m2 = _gate_mask(m2.astype(feat.dtype), gate)
                p1, p2 = unlab_feat * m1, unlab_feat * m2
        else:
            p1 = p2 = unlab_feat
        feature_fp1.append(jnp.concatenate([lab_feat, p1], axis=0))
        feature_fp2.append(jnp.concatenate([lab_feat, p2], axis=0))
    return feature_fp1, feature_fp2


def mask_selection(rng: jax.Array, scores: jnp.ndarray, percent: float,
                   wrs: bool = True) -> jnp.ndarray:
    """Repaired FilterDropout.mask_selection (FilterDropout.py:7-35): select
    `percent` of channels to DROP, either the top-scored ones (wrs=False) or
    by weighted random sampling (wrs=True, Efraimidis-Spirakis keys
    r**(1/score) on min-max-normalized scores). Returns a {0,1} keep-mask.

    The reference body references undefined `batch_size`/`threshold_expand`
    (its :18,32 latent bugs); this is the shape-consistent reading: scores
    [C] or [B,C] -> mask of the same shape, 0 = dropped.
    """
    if percent >= 1.0:
        raise ValueError(f"mask_selection percent must be < 1 (got {percent}): "
                         f"dropping every channel zeroes the feature map")
    squeeze = scores.ndim == 1
    s = scores[None] if squeeze else scores
    b, c = s.shape
    # drop_num == 0 (percent < 1/C) is an intentional no-op: thr is the max
    # key and nothing exceeds it. The clamp to C-1 makes the percent>=1 edge
    # explicit rather than relying on JAX's silent out-of-bounds index clamp.
    drop_num = min(int(c * percent), c - 1)
    if wrs:
        lo = jnp.min(s, axis=1, keepdims=True)
        hi = jnp.max(s, axis=1, keepdims=True)
        norm = (s - lo) / jnp.maximum(hi - lo, 1e-8)
        r = jax.random.uniform(rng, s.shape, minval=1e-8, maxval=1.0)
        key = r ** (1.0 / jnp.maximum(norm, 1e-8))
    else:
        key = s
    thr = jnp.sort(key, axis=1)[:, ::-1][:, drop_num][:, None]
    dropped = (key > thr).astype(jnp.float32)
    keep = 1.0 - dropped
    return keep[0] if squeeze else keep


def filter_dropout_channel(rng: jax.Array, scores: jnp.ndarray, percent: float,
                           wrs: bool = True) -> jnp.ndarray:
    """FilterDropout.filter_dropout_channel (:37-42): thin wrapper."""
    return mask_selection(rng, scores, percent, wrs)


def feature_dropout(rng: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """Attention-guided spatial dropout (unet.py:472-480): drop pixels whose
    channel-mean attention exceeds a random 0.7-0.9 fraction of the max."""
    attention = jnp.mean(x, axis=-1, keepdims=True)
    max_val = jnp.max(attention.reshape(x.shape[0], -1), axis=1)
    frac = jax.random.uniform(rng, (), minval=0.7, maxval=0.9)
    threshold = (max_val * frac).reshape(-1, 1, 1, 1)
    return x * (attention < threshold).astype(x.dtype)


def feature_noise(rng: jax.Array, x: jnp.ndarray, uniform_range: float = 0.3) -> jnp.ndarray:
    """Multiplicative uniform feature noise (unet.py:483-496)."""
    noise = jax.random.uniform(rng, x.shape[1:], minval=-uniform_range,
                               maxval=uniform_range, dtype=x.dtype)[None]
    return x * noise + x
