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


_probe = None  # (thread, outcome) — at most ONE outstanding probe collective


def process_health(timeout: float = 30.0) -> dict:
    """Timeout-based liveness probe.

    A collective over live processes can only complete, fail, or hang; the
    observable health signal is whether it completes within a deadline.
    The allgather runs in a worker thread: completion within `timeout` =
    healthy; a raised transport/coordination error = unhealthy with the
    error surfaced (`error`); no result within the deadline = unhealthy
    with `timed_out`.

    A timed-out probe's collective cannot be cancelled, so its thread stays
    blocked until the peer recovers or the coordination service gives up.
    At most ONE such thread ever exists: repeated probes of a wedged job
    wait on the outstanding collective instead of stacking new threads
    (`probe_pending` reports that state); a recovered peer unwedges it,
    after which fresh probes run again.
    """
    global _probe
    if not is_distributed():
        return {"processes": 1, "healthy": True, "timed_out": False,
                "probe_pending": False, "error": None}
    import threading

    from jax.experimental import multihost_utils

    def report(t, outcome):
        global _probe
        pending = t.is_alive()
        _probe = (t, outcome) if pending else None
        return {
            "processes": jax.process_count(),
            "healthy": (not pending) and outcome.get("ok", False),
            "timed_out": pending,
            "probe_pending": pending,
            "error": outcome.get("error"),
        }

    if _probe is not None:
        # previous probe still blocked in its collective: wait on IT
        import time

        t, outcome = _probe
        t_wait = time.monotonic()
        t.join(timeout)
        if t.is_alive():
            return report(t, outcome)
        _probe = None  # consumed; fall through to a fresh probe
        # the fresh probe gets only the REMAINING budget, so the total wait
        # never exceeds ~`timeout` (was: two full joins back to back)
        timeout = max(0.0, timeout - (time.monotonic() - t_wait))

    outcome = {}

    def run():
        try:
            multihost_utils.process_allgather(np.ones((1,), np.int32))
            outcome["ok"] = True
        except Exception as e:  # transport/coordination failure = peer down
            outcome["error"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout)
    return report(t, outcome)
