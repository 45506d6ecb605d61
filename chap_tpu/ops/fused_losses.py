"""Pallas TPU kernel: fused masked dice + cross-entropy statistics.

The BCP mixed-supervision loss (chap_tpu.losses.mix) needs, per class c:
    I_c = sum(mask * p_c * t_c)      (dice intersection)
    Z_c = sum(mask * p_c^2)          (dice prediction energy)
    Y_c = sum(mask * t_c)            (dice target energy; t one-hot => t^2=t)
plus  ce  = sum(mask * -log p_label) and  m = sum(mask),
where p = softmax(logits). Composed naively, XLA re-reads the [N, C] logits
for softmax, one-hot products, squares, and CE — several HBM passes over the
step's largest activation. This kernel computes all 3C+2 reductions in ONE
pass: logits live class-major [C, N] so the class axis sits in sublanes
(C=4 pads to 8, 2x; class-minor would pad 4 -> 128 lanes, 32x), the softmax
is a sublane reduction, and per-block partials accumulate in VMEM scratch
across a 1D grid with a final-block writeout.

The public entry is differentiable: custom_vjp with the analytic gradient
(softmax chain rule through dice + masked CE) implemented in JAX — the
backward is a single fused elementwise pass XLA handles well.

Falls back to interpreter mode off-TPU (tests run on CPU).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 512  # N-chunk per grid step (multiple of 128)


def _stats_kernel(logits_ref, labels_ref, mask_ref, out_ref, acc_ref):
    """Per-block partial sums. logits [C, LANES]; labels/mask [1, LANES];
    out/acc [C, 3 + 2] columns: (I, Z, Y, ce, m)."""
    i = pl.program_id(0)
    c = logits_ref.shape[0]

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    logits = logits_ref[:]                               # [C, L]
    m = mask_ref[0, :]                                   # [L]
    labels = labels_ref[0, :]                            # [L] int32
    # stable softmax over the class (sublane) axis
    mx = jnp.max(logits, axis=0, keepdims=True)
    ex = jnp.exp(logits - mx)
    denom = jnp.sum(ex, axis=0, keepdims=True)
    p = ex / denom                                       # [C, L]
    class_ids = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
    t = (class_ids == labels[None, :]).astype(p.dtype)   # one-hot [C, L]
    logp = (logits - mx) - jnp.log(denom)

    mb = m[None, :]
    inter = jnp.sum(p * t * mb, axis=1)                  # [C]
    z = jnp.sum(p * p * mb, axis=1)
    y = jnp.sum(t * mb, axis=1)
    ce = jnp.sum(-logp * t * mb, axis=1)                 # per-class CE [C]
    # (mask_sum is recovered outside as sum(y): one-hot rows sum to 1)

    acc_ref[:, 0] += inter
    acc_ref[:, 1] += z
    acc_ref[:, 2] += y
    acc_ref[:, 3] += ce

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _pad_to(x: jnp.ndarray, n: int, axis: int, value=0):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad, constant_values=value)


def _masked_seg_stats_xla(logits: jnp.ndarray, labels: jnp.ndarray,
                          mask: jnp.ndarray):
    """Pure-XLA twin of the Pallas kernel for non-TPU backends (identical
    math; interpret-mode Pallas is far slower to compile and run on CPU)."""
    c = logits.shape[-1]
    flat = logits.reshape(-1, c).astype(jnp.float32)
    lb = labels.reshape(-1)
    mb = mask.reshape(-1).astype(jnp.float32)[:, None]
    p = jax.nn.softmax(flat, axis=-1)
    t = (lb[:, None] == jnp.arange(c)).astype(jnp.float32)
    logp = jax.nn.log_softmax(flat, axis=-1)
    inter = jnp.sum(p * t * mb, axis=0)
    z = jnp.sum(p * p * mb, axis=0)
    y = jnp.sum(t * mb, axis=0)
    ce_sum = jnp.sum(-logp * t * mb)
    return inter, z, y, ce_sum, jnp.sum(y)


def masked_seg_stats(logits: jnp.ndarray, labels: jnp.ndarray,
                     mask: jnp.ndarray, interpret: bool | None = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                jnp.ndarray, jnp.ndarray]:
    """(I[C], Z[C], Y[C], ce_sum, mask_sum) for logits [..., C].

    interpret=None (default): Pallas kernel on TPU, pure-XLA twin elsewhere.
    interpret=True: force the Pallas kernel in interpreter mode (kernel tests).
    """
    if interpret is None and jax.default_backend() != "tpu":
        return _masked_seg_stats_xla(logits, labels, mask)
    c = logits.shape[-1]
    flat = logits.reshape(-1, c).astype(jnp.float32)
    n = flat.shape[0]
    n_pad = ((n + LANES - 1) // LANES) * LANES
    lg = _pad_to(flat, n_pad, 0).T                       # [C, Np] class-major
    lb = _pad_to(labels.reshape(1, -1).astype(jnp.int32), n_pad, 1)
    mk = _pad_to(mask.reshape(1, -1).astype(jnp.float32), n_pad, 1)

    grid = n_pad // LANES
    out = pl.pallas_call(
        _stats_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((c, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, 8), jnp.float32)],
        interpret=bool(interpret),
    )(lg, lb, mk)
    y = out[:, 2]
    return out[:, 0], out[:, 1], y, jnp.sum(out[:, 3]), jnp.sum(y)


def _compose(stats, smooth_dice: float, eps_ce: float):
    inter, z, y, ce_sum, m_sum = stats
    dice = jnp.mean(1.0 - (2.0 * inter + smooth_dice) / (z + y + smooth_dice))
    ce = ce_sum / (m_sum + eps_ce)
    return dice, ce


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_masked_dice_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                         mask: jnp.ndarray, smooth_dice: float = 1e-10,
                         eps_ce: float = 1e-16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(masked_dice_loss, masked_ce_loss) over logits [..., C], integer labels
    and {0,1} mask — semantics identical to
    dice_loss_bcp(softmax(logits), labels, mask) and
    masked_cross_entropy(logits, labels, mask), one fused HBM pass."""
    return _compose(masked_seg_stats(logits, labels, mask), smooth_dice, eps_ce)


def _fwd(logits, labels, mask, smooth_dice, eps_ce):
    stats = masked_seg_stats(logits, labels, mask)
    return _compose(stats, smooth_dice, eps_ce), (logits, labels, mask, stats)


def _bwd(smooth_dice, eps_ce, res, grads):
    logits, labels, mask, (inter, z, y, ce_sum, m_sum) = res
    g_dice, g_ce = grads
    c = logits.shape[-1]
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    t = (labels[..., None] == jnp.arange(c)).astype(jnp.float32)
    m = mask.astype(jnp.float32)[..., None]

    # dice: L = mean_c 1 - (2I_c + s)/(Z_c + Y_c + s)
    denom = z + y + smooth_dice
    dl_dI = -2.0 / denom / c                                  # [C]
    dl_dZ = (2.0 * inter + smooth_dice) / denom ** 2 / c      # [C]
    dl_dp = m * (dl_dI * t + dl_dZ * 2.0 * p)                 # [..., C]
    # CE: dL/dlogits = m*(p - t)/(m_sum + eps)
    dce_dlogits = m * (p - t) / (m_sum + eps_ce)
    # chain dice through softmax: dL/dlogit_j = p_j (dl_dp_j - sum_k dl_dp_k p_k)
    inner = jnp.sum(dl_dp * p, axis=-1, keepdims=True)
    ddice_dlogits = p * (dl_dp - inner)

    dlogits = (g_dice * ddice_dlogits + g_ce * dce_dlogits).astype(logits.dtype)
    return dlogits, None, None


fused_masked_dice_ce.defvjp(_fwd, _bwd)
