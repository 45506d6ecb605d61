"""Model cost self-benchmarks: parameter counts, per-layer-free FLOPs
estimate, and a fwd/bwd timing harness.

TPU-native equivalent of the reference's ad-hoc harnesses: ptflops __main__
blocks (vnet.py:338-352, ResNet2d.py:535-553) and the CUDA-event fwd/bwd
timer (networks_other.py:203-258) — here via jax.jit cost analysis and
wall-clock timing with dependency-chained repeats (one device sync).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def flops_estimate(fn: Callable, *args) -> Optional[float]:
    """XLA's own FLOP estimate for the compiled fn (None if unavailable)."""
    try:
        analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops"))
    except Exception:
        return None


def benchmark_fwd_bwd(model, sample: jnp.ndarray, num_iters: int = 10,
                      train: bool = True) -> Dict[str, float]:
    """{'fwd_ms', 'fwd_bwd_ms', 'params'} for one apply on `sample`."""
    variables = model.init({"params": jax.random.PRNGKey(0)}, sample, train=False)

    def fwd(v, x):
        out = model.apply(v, x, train=False)
        if isinstance(out, (tuple, list)):
            out = out[0]
        return jnp.sum(out)

    def fwd_bwd(v, x):
        return jax.grad(lambda vv: fwd(vv, x))(v)

    jfwd = jax.jit(fwd)
    jbwd = jax.jit(fwd_bwd)

    float(jfwd(variables, sample))  # compile
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(num_iters):
        s = float(jfwd(variables, sample))
    fwd_ms = (time.perf_counter() - t0) / num_iters * 1000

    g = jbwd(variables, sample)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(num_iters):
        g = jbwd(variables, sample)
    jax.block_until_ready(g)
    fwd_bwd_ms = (time.perf_counter() - t0) / num_iters * 1000

    return {"fwd_ms": fwd_ms, "fwd_bwd_ms": fwd_bwd_ms,
            "params": param_count(variables["params"])}
