"""On-chip phase-by-phase profiler for the on-device largest-CC NMS.

Itemizes where the NMS share of the CHAP train step goes (BENCH_NOTES:
~350-370 ms of the full 2D step) at the train-step shape — 72 masks of 256²
((C-1)=3 foreground classes x 24 pseudo-label maps) — on both extremes:
  noisy  random-net-like masks (thousands of tiny components; governs the
         bench_train_step numbers, which run a random-weight model)
  clean  elliptical blobs (1-3 compact components; governs sustained wall
         rate during real training, where pseudo-labels are clean after the
         first few hundred steps)

Usage: python scripts/profile_nms.py [noisy|clean|phases|seed|all]
Timings fence with a 1-element jax.device_get (block_until_ready returns
early through the tunnel — BENCH_NOTES caution).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from chap_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from chap_tpu.semi import nms  # noqa: E402

B, H, W = 72, 256, 256


def make_masks(kind: str) -> np.ndarray:
    rng = np.random.RandomState(0)
    if kind == "noisy":
        return rng.rand(B, H, W) > 0.7
    yy, xx = np.mgrid[:H, :W]
    m = np.zeros((B, H, W), bool)
    for i in range(B):
        for _ in range(rng.randint(1, 4)):
            cy, cx = rng.randint(40, H - 40, 2)
            ry, rx = rng.randint(12, 60, 2)
            m[i] |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1
    return m


def fence(x):
    jax.device_get(jnp.ravel(x)[0])


def bench(fn, *args, n=8, tag=""):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / n
    print(f"  {tag}: {dt * 1000:.1f} ms", flush=True)
    return out


def count_rounds(mask, **kw):
    """_label_mask_batch clone that also reports the round count."""
    b = mask.shape[0]
    spatial = mask.shape[1:]
    n = int(np.prod(spatial))
    rps = kw.get("rounds_per_sweep", 4)
    rpj = kw.get("rounds_per_jump", 24)
    start = kw.get("sweep_start", 2)
    idx = jnp.arange(n, dtype=jnp.int32).reshape((1,) + spatial)
    labels = jnp.where(mask, jnp.broadcast_to(idx, mask.shape), -1)

    def cond(c):
        labels, prev, _ = c
        return jnp.any(labels != prev)

    def jump(new):
        flat = new.reshape(b, n)
        j = jnp.take_along_axis(flat, jnp.maximum(flat, 0), axis=1)
        return jnp.where(flat >= 0, j, -1).reshape(mask.shape)

    def body(c):
        labels, _, it = c
        new = nms._propagate_max(labels, mask)
        new = jax.lax.cond((it >= start) & ((it - start) % rps == 0),
                           lambda x: nms._sweep_axes(x, mask),
                           lambda x: x, new)
        new = jax.lax.cond(it % rpj == rpj - 1, jump, lambda x: x, new)
        return new, labels, it + 1

    labels, _, it = jax.lax.while_loop(
        cond, body, (labels, jnp.full_like(labels, -2), jnp.int32(0)))
    return labels, it


def main(which):
    for kind in ("noisy", "clean"):
        if which not in (kind, "all", "seed"):
            continue
        mask = jnp.asarray(make_masks(kind))
        print(f"== {kind} ==", flush=True)
        if which in ("seed", "all"):
            for kw in ({}, {"rounds_per_sweep": 3}, {"rounds_per_sweep": 6},
                       {"rounds_per_jump": 12}):
                f = jax.jit(functools.partial(count_rounds, **kw))
                _, it = f(mask)
                bench(lambda m, f=f: f(m)[0], mask,
                      tag=f"label {kw} (rounds={int(it)})")
        # phase costs
        labels = jax.jit(nms._label_mask_batch)(mask)
        flat = labels.reshape(B, H * W)
        bench(jax.jit(nms._largest_id_sort), flat, tag="largest-id SORT")
        bench(jax.jit(lambda f: jnp.argmax(
            nms._component_sizes_matmul(f, H * W), axis=1)), flat,
            tag="largest-id HISTOGRAM")
        bench(jax.jit(nms._propagate_max), labels, mask, n=30,
              tag="one window prop")
        bench(jax.jit(nms._sweep_axes), labels, mask, n=15, tag="one sweep")
        bench(jax.jit(lambda f: jnp.where(
            f >= 0, jnp.take_along_axis(f, jnp.maximum(f, 0), axis=1), -1)),
            flat, n=8, tag="one pointer jump")
        flat_t = flat.T  # [N, B]: gather dim major instead of lane-minor
        bench(jax.jit(lambda f: jnp.where(
            f >= 0, jnp.take_along_axis(f, jnp.maximum(f, 0), axis=0), -1)),
            flat_t, n=8, tag="one pointer jump (transposed)")
        bench(jax.jit(nms.largest_cc_mask), mask, tag="FULL largest_cc_mask")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
