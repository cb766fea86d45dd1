"""Profiling helpers.

The reference only has manual wall-clock instrumentation
(`catre_evaluator.py:256-362`, SURVEY.md §5); here we add jax.profiler traces
plus a device-synchronized timer that works around the axon relay's broken
block_until_ready.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Force completion of a computation: block_until_ready plus a scalar
    fetch (block_until_ready alone may return early through remote-execution
    relays)."""
    jax.block_until_ready(tree)
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(leaf.ravel()[0] if leaf.ndim else leaf)


def timed(fn, *args, reps: int = 5, warmup: int = 2):
    """Median wall time of fn(*args) with device sync. Returns (seconds, out)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
        sync(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out
