"""Exact space-to-depth (s2d) conv transforms for small-channel 3D stages.

TPU activations put the channel dim in the 128-wide lane registers; a
full-resolution VNet stage at C=16 therefore runs its convs at <=12.5% MXU
utilization and its strided down/up convs bandwidth-bound (measured on v5e:
input conv 19 ms, 2^3-stride-2 down conv 23 ms, 1x1 out conv 23 ms at batch
48 x 112x112x80). Re-expressing the stage in s2d layout — each 2x2x2 spatial
block folded into 8x channels — is a bijective relayout under which:

  * a stride-1 odd-k conv (k<=5) becomes a 3^3 conv on 8x channels with a
    STRUCTURED rearrangement of the same weights (exact, derivation below);
  * the kernel=stride=2 down conv becomes a pure 1x1x1 conv (exact, zero
    extra FLOPs: each output voxel reads exactly one s2d cell);
  * the kernel=stride=2 transpose conv becomes a 1x1x1 conv producing the
    8 output phases as channels (exact);
  * a 1x1x1 conv becomes a block-diagonal 1x1x1 conv over phases (exact);
  * norm/relu are elementwise/statistics over the same element set (exact
    via a [..., 8, C] phase view).

These are weight-layout transforms applied at trace time — parameter trees,
shapes, and initializers stay identical to the plain `nn.Conv` modules, so
checkpoints and weight-copy parity tests are unaffected.

Derivation (1D, tensor-products to 3D). With cross-correlation semantics and
SAME padding, y[n] = sum_{o=-r..r} w[o+r] * x[n+o]. Write the s2d coords
x[2m+p] = xs[m, p], y[2m+q] = ys[m, q] for phases p,q in {0,1}. Substituting
q+o = 2e+p gives

    ys[m, q] = sum_{e,p} W'[e+1, p, q] * xs[m+e, p],
    W'[c, p, q] = w[2(c-1)+p-q+r]   if 0 <= 2(c-1)+p-q+r < k else 0,

with e in {-1,0,1} for r <= 2 — i.e. a kernel-3 conv whose (input-phase,
output-phase) channel block holds a shifted copy of the original taps. SAME
padding of 1 s2d cell is exact: any tap that would read beyond the original
r-pixel zero pad carries a zero weight by the range check.

The capability context is the reference's 3D inference/training path
(vnet.py:8-125 ConvBlock/DownsamplingConvBlock/Upsampling_function); the
reference itself has no TPU analog — this is the TPU-native speed-of-light
engineering the rebuild adds.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth_3d(x: jnp.ndarray) -> jnp.ndarray:
    """[B,W,H,D,C] -> [B,W/2,H/2,D/2,8C]; channel index = phase*C + c with
    phase = ((px*2+py)*2+pz). Requires even spatial dims."""
    b, w, h, d, c = x.shape
    assert w % 2 == 0 and h % 2 == 0 and d % 2 == 0, (w, h, d)
    x = x.reshape(b, w // 2, 2, h // 2, 2, d // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, w // 2, h // 2, d // 2, 8 * c)


def depth_to_space_3d(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth_3d`."""
    b, w2, h2, d2, pc = x.shape
    assert pc % 8 == 0, pc
    c = pc // 8
    x = x.reshape(b, w2, h2, d2, 2, 2, 2, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, 2 * w2, 2 * h2, 2 * d2, c)


def phase_view(x: jnp.ndarray) -> jnp.ndarray:
    """[B,W,H,D,8C] -> [B,W,H,D,8,C] view for per-original-channel norms."""
    b, w, h, d, pc = x.shape
    return x.reshape(b, w, h, d, 8, pc // 8)


def _tap_index(k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-dim tap map idx[c,p,q] = 2(c-1)+p-q+r and its validity mask."""
    r = (k - 1) // 2
    c = np.arange(3)[:, None, None]
    p = np.arange(2)[None, :, None]
    q = np.arange(2)[None, None, :]
    idx = 2 * (c - 1) + p - q + r
    valid = (idx >= 0) & (idx < k)
    return np.clip(idx, 0, k - 1), valid


def s2d_conv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[k,k,k,Ci,Co] (k odd, <=5) -> [3,3,3,8Ci,8Co] s2d-space kernel."""
    k = w.shape[0]
    assert k % 2 == 1 and k <= 5, k
    idx, valid = _tap_index(k)
    wf = jnp.take(w, jnp.asarray(idx.reshape(-1)), axis=0)
    wf = jnp.take(wf, jnp.asarray(idx.reshape(-1)), axis=1)
    wf = jnp.take(wf, jnp.asarray(idx.reshape(-1)), axis=2)
    ci, co = w.shape[3], w.shape[4]
    # [cx,px,qx, cy,py,qy, cz,pz,qz, Ci, Co]
    wf = wf.reshape(3, 2, 2, 3, 2, 2, 3, 2, 2, ci, co)
    mask = (valid.reshape(3, 2, 2, 1, 1, 1, 1, 1, 1)
            & valid.reshape(1, 1, 1, 3, 2, 2, 1, 1, 1)
            & valid.reshape(1, 1, 1, 1, 1, 1, 3, 2, 2))
    wf = wf * jnp.asarray(mask[..., None, None], wf.dtype)
    # -> [cx,cy,cz, px,py,pz, Ci, qx,qy,qz, Co] -> [3,3,3, 8Ci, 8Co]
    wf = wf.transpose(0, 3, 6, 1, 4, 7, 9, 2, 5, 8, 10)
    return wf.reshape(3, 3, 3, 8 * ci, 8 * co)


def s2d_out_conv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """[k,k,k,Ci,Co] (k odd) -> [k+1,k+1,k+1,Ci,8Co]: kernel of the stride-2
    conv computing ``s2d(conv_k(x))`` DIRECTLY from the plain-layout input.

    Why it exists: a conv with Co<=32 output channels fills <=25% of the
    TPU's 128-wide lanes, and the MXU runs it at the speed of a 32-wide
    matmul no matter what (measured: the equivalent [V,27Ci]@[27Ci,32]
    matmul is just as slow, while widening the output to 128 lanes is
    nearly free). Emitting all 8 s2d phases as channels makes the output
    8*Co wide — 2.37x the FLOPs (64 taps / 27, half-resolution grid) at
    ~4x the issue rate, measured 16.4 -> 10.4 ms on the 32-ch LA stage.

    Derivation per dim (SAME pad, cross-correlation, r=(k-1)/2): output
    voxel 2m+q = sum_o w[o+r] x[2m+q+o]. A stride-2 kernel-(k+1) conv with
    pad (r,r) reads input voxels 2m-r+j, j in [0,k]; matching 2m+q+o gives
    j = q+o+r, so k4[j, ci, q*Co+co] = w[j-q, ci, co] when 0 <= j-q < k,
    else 0. Boundary taps that would read past the original SAME pad carry
    zero weight by the range check, so the zero pad (r,r) is exact.
    """
    k = w.shape[0]
    assert k % 2 == 1, k
    ci, co = w.shape[3], w.shape[4]
    j = np.arange(k + 1)[:, None]
    q = np.arange(2)[None, :]
    idx = j - q
    valid = (idx >= 0) & (idx < k)
    idxc = jnp.asarray(np.clip(idx, 0, k - 1).reshape(-1))
    wf = jnp.take(w, idxc, axis=0)
    wf = jnp.take(wf, idxc, axis=1)
    wf = jnp.take(wf, idxc, axis=2)
    # [jx,qx, jy,qy, jz,qz, Ci, Co]
    wf = wf.reshape(k + 1, 2, k + 1, 2, k + 1, 2, ci, co)
    mask = (valid.reshape(k + 1, 2, 1, 1, 1, 1)
            & valid.reshape(1, 1, k + 1, 2, 1, 1)
            & valid.reshape(1, 1, 1, 1, k + 1, 2))
    wf = wf * jnp.asarray(mask[..., None, None], wf.dtype)
    # output channel = ((qx*2+qy)*2+qz)*Co + co (space_to_depth_3d order)
    wf = wf.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return wf.reshape(k + 1, k + 1, k + 1, ci, 8 * co)


def zpack_conv_kernel(w: jnp.ndarray, factor: int = 4) -> jnp.ndarray:
    """[kx,ky,kz,Ci,Co] (kz odd) -> [kx,ky,kz+factor-1,Ci,factor*Co]: kernel
    of the stride-(1,1,factor) conv computing `factor` consecutive z outputs
    as channel groups — output channel q*Co+co holds plain-layout output
    z = factor*g + q.

    Why one axis only: a Co=32 conv fills 32 of the 128 MXU lanes and runs
    at the speed of a 32-wide matmul (see s2d_out_conv_kernel). Packing
    ALONG Z alone widens the output to factor*Co lanes for only
    (kz+factor-1)/kz x the FLOPs (1.67x less than full-s2d's 2.37x at
    factor=4), and — unlike the 8-phase s2d layout — the unpack
    [..., Z/f, f*Co] -> [..., Z, Co] is a CONTIGUOUS reshape (group-major
    lane order q*Co+co flattens to z,co in linear memory), not a
    reshape-transpose relayout.

    Derivation (SAME pad, cross-correlation, r=(kz-1)/2): output voxel
    z = f*g+q needs sum_dz w[dz+r] x[f*g+q+dz]. A stride-f kernel-(kz+f-1)
    conv with z-pad (r,r) reads x[f*g - r + j]; matching gives j = q+dz+r,
    so K[.., j, ci, q*Co+co] = w[.., j-q, ci, co] when 0 <= j-q < kz, else
    0. Boundary taps past the SAME pad carry zero weight by the range
    check, so the (r,r) zero pad is exact. Windows fit exactly when
    Z % factor == 0.
    """
    kz = w.shape[2]
    assert kz % 2 == 1, kz
    ci, co = w.shape[3], w.shape[4]
    j = np.arange(kz + factor - 1)[:, None]
    q = np.arange(factor)[None, :]
    idx = j - q
    valid = (idx >= 0) & (idx < kz)
    wf = jnp.take(w, jnp.asarray(np.clip(idx, 0, kz - 1).reshape(-1)), axis=2)
    # [kx,ky,(j,q),Ci,Co] -> [kx,ky,j,q,Ci,Co]
    wf = wf.reshape(w.shape[0], w.shape[1], kz + factor - 1, factor, ci, co)
    wf = wf * jnp.asarray(valid[None, None, :, :, None, None], wf.dtype)
    # -> [kx,ky,j,Ci,q,Co] -> [kx,ky,j,Ci, q*Co+co]
    wf = wf.transpose(0, 1, 2, 4, 3, 5)
    return wf.reshape(w.shape[0], w.shape[1], kz + factor - 1, ci, factor * co)


def zpack_unpack(y: jnp.ndarray, co: int) -> jnp.ndarray:
    """[B,X,Y,Z/f,f*Co] -> [B,X,Y,Z,Co] — contiguous reshape (see above)."""
    b, x, yy, zg, fco = y.shape
    return y.reshape(b, x, yy, zg * (fco // co), co)


def s2d_down_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """kernel=stride=2 down conv [2,2,2,Ci,Co] -> 1x1x1 kernel [1,1,1,8Ci,Co]."""
    ci, co = w.shape[3], w.shape[4]
    return w.reshape(1, 1, 1, 8 * ci, co)


def s2d_deconv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """kernel=stride=2 transpose conv [2,2,2,Ci,Co] -> [1,1,1,Ci,8Co]
    producing the 8 output phases as (phase-major) channels.

    flax nn.ConvTranspose with kernel=strides=(2,2,2) places the SPATIALLY
    FLIPPED kernel at each input cell (verified numerically), so
    ys[m, q*Co+co] = sum_ci w[1-qx,1-qy,1-qz,ci,co] x[m,ci].
    """
    ci, co = w.shape[3], w.shape[4]
    w = w[::-1, ::-1, ::-1]
    return w.transpose(3, 0, 1, 2, 4).reshape(1, 1, 1, ci, 8 * co)


def s2d_pointwise_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """1x1x1 conv [1,1,1,Ci,Co] -> block-diagonal [1,1,1,8Ci,8Co] over phases."""
    ci, co = w.shape[3], w.shape[4]
    eye = jnp.eye(8, dtype=w.dtype)
    blk = jnp.einsum("pq,ij->piqj", eye, w.reshape(ci, co))
    return blk.reshape(1, 1, 1, 8 * ci, 8 * co)


def conv3d(x: jnp.ndarray, w: jnp.ndarray, strides=(1, 1, 1),
           padding="SAME") -> jnp.ndarray:
    """NHWDC/HWDIO conv wrapper."""
    return jax.lax.conv_general_dilated(
        x, w, strides, padding,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
