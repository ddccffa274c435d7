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


def process_health() -> dict:
    """Liveness snapshot: processes seen alive via a global sum."""
    if not is_distributed():
        return {"processes": 1, "alive": 1, "healthy": True}
    from jax.experimental import multihost_utils

    alive = multihost_utils.process_allgather(np.ones((1,), np.int32))
    n = int(alive.sum())
    return {
        "processes": jax.process_count(),
        "alive": n,
        "healthy": n == jax.process_count(),
    }
