"""Profiling / tracing (SURVEY §5: the reference has none; we add
`jax.profiler` traces plus lightweight wall-clock stage timing)."""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "device_timer", "profile_carve"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def device_timer(name: str, results: dict | None = None):
    """Wall-clock a device computation, forcing a sync at exit.

    NOTE: on the tunneled axon backend, `block_until_ready` does not drain
    the queue — callers must read back a value; this timer only brackets."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[name] = results.get(name, 0.0) + dt


def profile_carve(luma, n_seams: int, blocksize: int = 8, *, log_dir: str):
    """Trace one full carve for kernel-level inspection."""
    import jax.numpy as jnp
    from ..ops.carve import carve_n_seams

    with trace(log_dir):
        state = carve_n_seams(jnp.asarray(luma), n_seams, blocksize, 0.0, 1.0)
        jax.block_until_ready(state)
        int(state.width)  # force the tunnel to drain
    return state
