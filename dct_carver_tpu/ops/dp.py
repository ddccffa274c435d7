"""Seam dynamic programming + seam removal/insertion ops (single device).

TPU-first recast of the liblqr carving engine's core (the external `lqr-1`
library behind `/root/reference/src/render.c:312-315,377`):

* Cumulative energy ``M[i,j] = E[i,j] + min(M[i-1,j-1], M[i-1,j], M[i-1,j+1])``
  (delta_x=1, rigidity=0 per `src/render.c:313`) as a `lax.scan` over rows —
  each step is one fused VPU pass over the row; no per-pixel callbacks.
* Backtracking as a reverse `lax.scan` with a 3-wide dynamic slice per row.
* Seam removal as a branch-free select-shift compaction (no gathers in the
  inner loop) over a static-width buffer with a dynamic logical width —
  XLA-friendly static shapes for the whole multi-seam carve loop.

Tie conventions (identical to oracle/reference.py): leftmost argmin at the
last row; leftmost minimum among the 3 backtrack candidates.

All functions are shape-polymorphic pure functions, safe under jit/vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "cumulative_energy",
    "backtrack",
    "find_seam",
    "remove_seam",
    "mask_energy",
]


def _rigidity_penalties(delta_x: int, rigidity: float, dtype):
    """Per-step-offset penalty, this framework's spec of liblqr's
    `lqr_carver_init(delta_x, rigidity)` generalization: a seam may move up
    to `delta_x` columns per row, and a step of |dx| costs
    ``rigidity * |dx| / delta_x``.  The reference plugin always runs
    (delta_x=1, rigidity=0) (`src/render.c:313`) — the parity-tested config —
    where this reduces exactly to the classic 3-candidate recurrence."""
    return [rigidity * abs(dx) / delta_x for dx in range(-delta_x, delta_x + 1)]


def _shift_row(row: jax.Array, dx: int, inf) -> jax.Array:
    """row shifted so index j holds row[j + dx]; vacated slots are +inf."""
    if dx == 0:
        return row
    if dx < 0:
        return jnp.concatenate([jnp.broadcast_to(inf, (-dx,)), row[:dx]])
    return jnp.concatenate([row[dx:], jnp.broadcast_to(inf, (dx,))])


def cumulative_energy(E: jax.Array, delta_x: int = 1,
                      rigidity: float = 0.0) -> jax.Array:
    """(H, W) energy -> (H, W) DP cumulative energy.  At the default
    (delta_x=1, rigidity=0) this matches the oracle bitwise given
    bitwise-equal inputs (same op order: E + min(min(left, center), right));
    see `_rigidity_penalties` for the generalized recurrence."""
    dtype = E.dtype
    inf = jnp.asarray(jnp.inf, dtype)
    pen = _rigidity_penalties(delta_x, rigidity, dtype)

    def step(prev, e_row):
        # leftmost-first candidate order; ties resolved by the backtrack
        best = None
        for k, dx in enumerate(range(-delta_x, delta_x + 1)):
            cand = _shift_row(prev, dx, inf)
            if pen[k] != 0.0:
                cand = cand + dtype.type(pen[k])
            best = cand if best is None else jnp.minimum(best, cand)
        m = e_row + best
        return m, m

    m0 = E[0]
    _, rest = jax.lax.scan(step, m0, E[1:])
    return jnp.concatenate([m0[None], rest], axis=0)


def backtrack(M: jax.Array, delta_x: int = 1,
              rigidity: float = 0.0) -> jax.Array:
    """(H, W) cumulative energy -> (H,) int32 seam columns.  Ties pick the
    leftmost minimum among the 2*delta_x+1 (penalized) candidates."""
    H, W = M.shape
    dtype = M.dtype
    k = 2 * delta_x + 1
    Mp = jnp.pad(M, ((0, 0), (delta_x, delta_x)), constant_values=jnp.inf)
    pen = jnp.asarray(_rigidity_penalties(delta_x, rigidity, dtype), dtype)
    j_last = jnp.argmin(M[-1]).astype(jnp.int32)

    def step(j, row_p):
        # padded window [j-delta_x .. j+delta_x]; borders +inf, never chosen
        win = jax.lax.dynamic_slice(row_p, (j,), (k,))
        if rigidity != 0.0:
            win = win + pen
        j_new = j - delta_x + jnp.argmin(win).astype(jnp.int32)
        return j_new, j_new

    _, seam_rev = jax.lax.scan(step, j_last, Mp[:-1][::-1])
    return jnp.concatenate([seam_rev[::-1], j_last[None]])


def find_seam(E: jax.Array, delta_x: int = 1, rigidity: float = 0.0) -> jax.Array:
    return backtrack(cumulative_energy(E, delta_x, rigidity), delta_x, rigidity)


def mask_energy(E: jax.Array, width: jax.Array) -> jax.Array:
    """+inf beyond the logical width so DP never enters the dead region."""
    col = jnp.arange(E.shape[1])
    return jnp.where(col[None, :] < width, E, jnp.inf).astype(E.dtype)


def remove_seam(arr: jax.Array, seam: jax.Array) -> jax.Array:
    """Compact one pixel per row out of a static-width buffer.

    arr: (H, W[, C]); seam: (H,) int32.  Column j of the result is arr[:, j]
    for j < seam and arr[:, j+1] for j >= seam; the last column is garbage
    (it falls in the caller's dead region).  Branch-free: one roll + select.
    """
    W = arr.shape[1]
    shifted = jnp.roll(arr, -1, axis=1)
    keep = jnp.arange(W)[None, :] < seam[:, None]
    if arr.ndim == 3:
        keep = keep[..., None]
    return jnp.where(keep, arr, shifted)
