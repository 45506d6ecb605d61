"""Persistent XLA compilation cache — TPU compiles of the 3D models take
minutes; cache them across processes (driver runs, benchmarks, CLIs)."""
from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "CHAP_JAX_CACHE", os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
