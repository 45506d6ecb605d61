"""Decompose the sliding-window engine's device time on the real chip.

Each variant is ONE jitted dispatch over the whole 48-patch LA grid with a
scalar (or tiny) output, so measurements are pure device compute — no output
relayout or download pollution. Dependency-chained reps, one final sync.

Usage: python scripts/bench_engine_parts.py [sw_batch] [s2d:0|1]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from chap_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from chap_tpu.config import ModelConfig  # noqa: E402
from chap_tpu.eval.sliding_window import compute_grid  # noqa: E402
from chap_tpu.models import net_factory_3d  # noqa: E402

PATCH = (112, 112, 80)
REPS = 10


def _sync(out):
    # On tunnel-attached chips block_until_ready can return early; a real
    # device->host download of one element is the only trustworthy fence.
    leaf = jax.tree.leaves(out)[0]
    jax.device_get(leaf.ravel()[0])


def timed(fn, *args):
    _sync(fn(*args))  # warmup + compile
    _sync(fn(*args))  # settle
    t0 = time.perf_counter()
    out = None
    for _ in range(REPS):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / REPS * 1000.0


def main():
    sw_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    use_s2d = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    cfg = ModelConfig()
    cfg.dtype = "bfloat16"
    cfg.s2d_stem = use_s2d
    num_classes = 2
    model = net_factory_3d("vnet", 1, num_classes, mode="test", cfg=cfg)
    sample = jnp.zeros((sw_batch, *PATCH, 1), jnp.bfloat16)
    variables = jax.jit(lambda k: model.init({"params": k}, sample, train=False))(
        jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    volume = jnp.asarray(rng.rand(160, 160, 88).astype(np.float32))
    starts = compute_grid((160, 160, 88), PATCH, 18, 4)
    n = starts.shape[0]
    n_pad = ((n + sw_batch - 1) // sw_batch) * sw_batch
    valid = np.ones((n_pad,), np.float32)
    if n_pad != n:
        starts = np.concatenate([starts, np.zeros((n_pad - n, 3), np.int32)])
        valid[n:] = 0.0
    starts_d = jnp.asarray(starts.reshape(-1, sw_batch, 3))
    valid_d = jnp.asarray(valid.reshape(-1, sw_batch))

    ww, hh, dd = volume.shape

    def sel(s):
        sx = (jnp.arange(ww)[None, :] == (s[0] + jnp.arange(PATCH[0]))[:, None]).astype(jnp.float32)
        sy = (jnp.arange(hh)[None, :] == (s[1] + jnp.arange(PATCH[1]))[:, None]).astype(jnp.float32)
        sz = (jnp.arange(dd)[None, :] == (s[2] + jnp.arange(PATCH[2]))[:, None]).astype(jnp.float32)
        return sx, sy, sz

    def gather(vol, b_starts):
        sx, sy, sz = jax.vmap(sel)(b_starts)
        g = jnp.einsum("XYZ,bxX->bxYZ", vol, sx)
        g = jnp.einsum("bxYZ,byY->bxyZ", g, sy)
        return jnp.einsum("bxyZ,bzZ->bxyz", g, sz).astype(jnp.bfloat16), (sx, sy, sz)

    # 1) gather only
    def run_gather(vol, st):
        def body(c, b):
            p, _ = gather(vol, b)
            return c + p.astype(jnp.float32).mean(), None
        c, _ = jax.lax.scan(body, 0.0, st)
        return c

    # 2) gather + forward (mean-consumed: no output layout materialization)
    def run_fwd(v, vol, st):
        def body(c, b):
            p, _ = gather(vol, b)
            out = model.apply(v, p[..., None], train=False)
            return c + out.astype(jnp.float32).mean(), None
        c, _ = jax.lax.scan(body, 0.0, st)
        return c

    # 3) full: gather + forward + softmax + scatter + argmax (engine semantics)
    def run_full(v, vol, st, va):
        score0 = jnp.zeros((num_classes, ww, hh, dd), jnp.float32)
        cnt0 = jnp.zeros((ww, hh, dd), jnp.float32)

        def body(carry, b):
            sc, ct = carry
            b_starts, b_valid = b
            p, (sx, sy, sz) = gather(vol, b_starts)
            out = model.apply(v, p[..., None], train=False)
            out = jnp.moveaxis(out, -1, 1)
            probs = jax.nn.softmax(out.astype(jnp.float32), axis=1)
            probs = probs * b_valid[:, None, None, None, None]
            s_ = jnp.einsum("bcxyz,bzZ->bcxyZ", probs, sz)
            s_ = jnp.einsum("bcxyZ,byY->bcxYZ", s_, sy)
            sc = sc + jnp.einsum("bcxYZ,bxX->cXYZ", s_, sx)
            mx = jnp.sum(sx, axis=1) * b_valid[:, None]
            ct = ct + jnp.einsum("bX,bY,bZ->XYZ", mx, jnp.sum(sy, axis=1),
                                 jnp.sum(sz, axis=1))
            return (sc, ct), None

        (score, cnt), _ = jax.lax.scan(body, (score0, cnt0), (st, va))
        label = jnp.argmax(score / jnp.maximum(cnt, 1e-8)[None], axis=0)
        return label.astype(jnp.int8)

    t_gather = timed(jax.jit(run_gather), volume, starts_d)
    t_fwd = timed(jax.jit(run_fwd), variables, volume, starts_d)
    t_full = timed(jax.jit(run_full), variables, volume, starts_d, valid_d)

    n_steps = starts_d.shape[0]
    print(f"sw_batch={sw_batch} s2d={use_s2d} grid={n} patches "
          f"({n_steps} scan steps), ms per volume dispatch:")
    print(f"  gather only          : {t_gather:8.2f}")
    print(f"  gather+forward       : {t_fwd:8.2f}  "
          f"(fwd ~ {t_fwd - t_gather:.2f})")
    print(f"  full engine (device) : {t_full:8.2f}  "
          f"(scatter+argmax ~ {t_full - t_fwd:.2f})  "
          f"-> {n / (t_full / 1000):6.1f} patches/s compute-bound")


if __name__ == "__main__":
    main()
