"""Profiling helpers.

The reference's only tracing is a 1 Hz printf meter (main.cpp:1230-1237)
and a commented-out clock() around the kd build (main.cpp:868-872). TPU
equivalents: jax.profiler traces viewable in XProf/TensorBoard, and a
dependent-fetch device timer that is robust to async dispatch (plain
block_until_ready under-measures through the axon tunnel — see
scripts/microbench_tpu.py).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace_profile(logdir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_timer(fn, *args, iters: int = 5, warmup: int = 1):
    """Wall-clock a jitted fn with a dependent scalar fetch per call.
    Returns seconds per call (includes one host round-trip)."""
    def scalarize(out):
        leaves = jax.tree.leaves(out)
        return sum(
            jnp.sum(jnp.ravel(leaf)[:1].astype(jnp.float32))
            for leaf in leaves
        )

    g = jax.jit(lambda *a: scalarize(fn(*a)))
    for _ in range(warmup):
        float(g(*args))
    t0 = time.time()
    for _ in range(iters):
        float(g(*args))
    return (time.time() - t0) / iters
