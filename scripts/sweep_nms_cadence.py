"""On-chip sweep of the NMS accelerator cadence constants.

BENCH_NOTES round 5: in-graph largest-CC NMS costs ~115-130 ms of the full
2D step on THIS protocol's pseudo-labels — not the profiler's "noisy" iid
extreme (percolating fractal components) nor its "clean" one (1-3 blobs),
but an intermediate regime: one dominant anatomical component per class
plus ~100 small noise components. This script times _label_mask_batch's
(rounds_per_sweep, sweep_start, rounds_per_jump) combinations on masks of
that shape (ellipse + 2% iid specks, which do NOT percolate) at the
train-step shape (72 x 256^2), plus both profiler extremes as guard rails.

Usage: python scripts/sweep_nms_cadence.py
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
    yy, xx = np.mgrid[:H, :W]
    if kind == "noisy":                       # percolating worst case
        return rng.rand(B, H, W) > 0.7
    m = np.zeros((B, H, W), bool)
    for i in range(B):
        for _ in range(rng.randint(1, 4)):
            cy, cx = rng.randint(40, H - 40, 2)
            ry, rx = rng.randint(12, 60, 2)
            m[i] |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1
    if kind == "speckled":                    # the train-step regime
        m |= rng.rand(B, H, W) > 0.98
    return m


def fence(x):
    jax.device_get(jnp.ravel(x)[0])


def bench(masks, rps, ss, rpj, n=6):
    fn = jax.jit(functools.partial(nms._label_mask_batch,
                                   rounds_per_sweep=rps, rounds_per_jump=rpj,
                                   sweep_start=ss))
    fence(fn(masks))
    t0 = time.perf_counter()
    for _ in range(n):
        fence(fn(masks))
    return (time.perf_counter() - t0) / n * 1000


def main():
    combos = [
        (4, 2, 24),    # shipped default
        (6, 2, 24),    # round-4's standalone cadence sweet spot
        (3, 1, 24),
        (2, 1, 24),
        (4, 2, 12),
        (8, 4, 24),
    ]
    masks = {k: jnp.asarray(make_masks(k)) for k in
             ("speckled", "clean", "noisy")}
    # correctness guard: every combo must agree with the host reference
    ref = {k: nms._largest_cc_host(
        np.where(np.asarray(masks[k]), 1, 0), 2) for k in masks}
    print(f"{'rps':>4} {'ss':>3} {'rpj':>4} | {'speckled':>9} {'clean':>7} "
          f"{'noisy':>7}  (ms, {B}x{H}x{W})")
    for rps, ss, rpj in combos:
        row = []
        for k in ("speckled", "clean", "noisy"):
            labels = jax.jit(functools.partial(
                nms._label_mask_batch, rounds_per_sweep=rps,
                rounds_per_jump=rpj, sweep_start=ss))(masks[k])
            flat = labels.reshape(B, -1)
            keep = flat == nms._largest_id_sort(flat)[:, None]
            got = np.where(np.asarray(keep.reshape(masks[k].shape))
                           & np.asarray(masks[k]), 1, 0)
            assert (got == ref[k]).all(), (rps, ss, rpj, k)
            row.append(bench(masks[k], rps, ss, rpj))
        print(f"{rps:>4} {ss:>3} {rpj:>4} | {row[0]:>9.1f} {row[1]:>7.1f} "
              f"{row[2]:>7.1f}")


if __name__ == "__main__":
    main()
