"""Profiling and observability helpers.

The reference's only performance tooling is "run it twice, the first run
compiles" (reference: README.md:67). Here: wall-clock step timing with device
sync, per-term energy breakdowns for structured metrics, and a thin wrapper
over ``jax.profiler`` traces for TensorBoard.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


def time_fn(fn, *args, iters: int = 10, warmup: int = 2):
    """Median wall-clock seconds per call of a (jitted) function, device-synced."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def energy_breakdown(terms: dict) -> dict:
    """Evaluate a dict of named thunks into floats (structured metrics line)."""
    return {name: float(thunk()) for name, thunk in terms.items()}
