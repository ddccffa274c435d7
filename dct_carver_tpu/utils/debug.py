"""Debug modes (SURVEY §5: the analog of sanitizers/race detection the
reference lacks): NaN checking and jit-disabled step-through execution."""

from __future__ import annotations

import contextlib

import jax

__all__ = ["debug_mode", "check_finite"]


@contextlib.contextmanager
def debug_mode(*, nan_checks: bool = True, disable_jit: bool = False):
    """Run a block with jax_debug_nans (energies/DP must stay finite) and
    optionally without jit (op-by-op, python-debuggable)."""
    ctxs = []
    if nan_checks:
        ctxs.append(jax.debug_nans(True))
    if disable_jit:
        ctxs.append(jax.disable_jit())
    with contextlib.ExitStack() as stack:
        for c in ctxs:
            stack.enter_context(c)
        yield


def check_finite(state, where: str = "") -> None:
    """Assert a CarveState has finite live values (host-side check)."""
    import numpy as np

    w = int(state.width)
    e = np.asarray(state.energy)[:, :w]
    l = np.asarray(state.luma)[:, :w]
    if not np.isfinite(e).all():
        raise FloatingPointError(f"non-finite energy {where}")
    if not np.isfinite(l).all():
        raise FloatingPointError(f"non-finite luma {where}")
