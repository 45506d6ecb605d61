"""Profiling: jax.profiler trace capture (TPU equivalent of the reference's
tensorboardX scalars + CUDA-event timers, SURVEY.md §5)."""
from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in TensorBoard (profile plugin) or
    Perfetto: with trace('runs/profile'): step(...)"""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
