"""Reproduce/bisect the host-side per-transfer memory leak (VERDICT r4 item 2).

The 24k-step run leaked ~6-7 MB/step of host RSS — roughly one batch payload
per step — around the per-step host->device transfer on the tunnel client
(BENCH_NOTES round-4 operational findings). Device HBM was stable and a fresh
process resumed at full rate, so the retention is host-side.

This script runs a TRANSFER-ONLY loop (no train step) and reports RSS growth
per iteration for several variants, to localize the retaining reference:

  plain        device_put(np_batch) + block_until_ready, drop the handle
  delete       ... + explicit jax.Array.delete()
  gc           ... + gc.collect() every 50 iters
  reuse        transfer from ONE preallocated numpy buffer (no fresh np alloc)
  donate       jitted identity with donate_argnums consuming the transfer

Usage: python scripts/repro_transfer_leak.py [variant ...] [--iters N]
"""
from __future__ import annotations

import argparse
import gc
import sys

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("variants", nargs="*",
                   default=["plain", "delete", "gc", "reuse", "donate"])
    p.add_argument("--iters", type=int, default=400)
    p.add_argument("--mb", type=float, default=4.7,
                   help="payload size in MB (default = 2D CHAP compact batch)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    n = int(args.mb * 1e6 / 2)  # bf16 elements
    base = np.random.default_rng(0).standard_normal(n).astype(np.float32)

    def make_payload():
        return base.astype(jnp.bfloat16)

    @jax.jit
    def consume(x):
        return jnp.sum(x.astype(jnp.float32))

    donate_fn = jax.jit(lambda x: x * 2 + 1, donate_argnums=(0,))

    for variant in args.variants:
        gc.collect()
        # warmup: compile + first transfers
        for _ in range(5):
            x = jax.device_put(make_payload(), dev)
            consume(x).block_until_ready()
        gc.collect()
        r0 = rss_mb()
        live0 = len(jax.live_arrays())
        reuse_buf = make_payload()
        for i in range(args.iters):
            if variant == "reuse":
                x = jax.device_put(reuse_buf, dev)
            else:
                x = jax.device_put(make_payload(), dev)
            if variant == "donate":
                x = donate_fn(x)
            consume(x).block_until_ready()
            if variant == "delete":
                x.delete()
            del x
            if variant == "gc" and i % 50 == 49:
                gc.collect()
        gc.collect()
        r1 = rss_mb()
        live1 = len(jax.live_arrays())
        per_iter = (r1 - r0) / args.iters
        print(f"{variant:8s}  rss {r0:8.1f} -> {r1:8.1f} MB  "
              f"({per_iter:+.3f} MB/iter, payload {args.mb} MB)  "
              f"live_arrays {live0}->{live1}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
