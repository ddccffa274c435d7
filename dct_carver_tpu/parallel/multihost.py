"""Multi-host initialization + failure detection (SURVEY §5).

The reference is a single desktop process; scaling targets (BASELINE config 5)
need `jax.distributed` across hosts.  This module wraps initialization, a
startup barrier, and a heartbeat-style liveness check; combined with
utils/checkpoint.py the seam loop is restartable after host failure.

Single-host (including the CI CPU mesh) everything degrades to no-ops, so the
same program runs anywhere.
"""

from __future__ import annotations

import os

import jax
import numpy as np

__all__ = ["initialize", "is_distributed", "barrier", "process_health"]

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID); no-op when
    single-process or already initialized."""
    global _initialized
    if _initialized:
        return
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None:
        _initialized = True  # single-host mode
        return
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes or int(os.environ.get("NUM_PROCESSES", "1")),
        process_id=process_id or int(os.environ.get("PROCESS_ID", "0")),
    )
    _initialized = True


def is_distributed() -> bool:
    return jax.process_count() > 1


def barrier(name: str = "startup") -> None:
    """Cross-host barrier: an all-reduce over one scalar per process.  Hangs
    (then raises via the coordination-service timeout) if a host is down —
    the failure-detection primitive for the seam loop."""
    if not is_distributed():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def process_health(timeout: float = 30.0) -> dict:
    """Timeout-based liveness probe.

    A collective over live processes can only complete or hang, so "alive
    count" is not observable directly; the observable signal is WHETHER the
    collective completes within a deadline.  The allgather runs in a worker
    thread; if it does not finish within `timeout` seconds, some peer is
    down/wedged and the probe reports unhealthy.  (The orphaned thread is
    left to the coordination-service timeout — detection is non-destructive.)
    """
    if not is_distributed():
        return {"processes": 1, "healthy": True, "timed_out": False}
    import threading

    from jax.experimental import multihost_utils

    done = threading.Event()

    def probe():
        multihost_utils.process_allgather(np.ones((1,), np.int32))
        done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    ok = done.wait(timeout)
    return {
        "processes": jax.process_count(),
        "healthy": ok,
        "timed_out": not ok,
    }
