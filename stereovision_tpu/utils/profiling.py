"""Profiling helpers (SURVEY §5: the reference's only tracing is wall-clock
prints; the TPU equivalent is jax.profiler traces + annotated ranges)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named range that shows up inside profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def timed(fn, *args, n: int = 10, warmup: int = 1):
    """Robust device timing through the async dispatch queue: n dispatches,
    one readback. Returns seconds per call."""
    import jax.numpy as jnp

    def sync(out):
        leaves = jax.tree.leaves(out)
        return float(jnp.sum(leaves[0].astype(jnp.float32)))

    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n
