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


def cumulative_energy(E: jax.Array) -> jax.Array:
    """(H, W) energy -> (H, W) DP cumulative energy. Matches oracle bitwise
    given bitwise-equal inputs (same op order: E + min(min(left, center), right))."""
    dtype = E.dtype
    inf = jnp.full((1,), jnp.inf, dtype)

    def step(prev, e_row):
        left = jnp.concatenate([inf, prev[:-1]])
        right = jnp.concatenate([prev[1:], inf])
        m = e_row + jnp.minimum(jnp.minimum(left, prev), right)
        return m, m

    m0 = E[0]
    _, rest = jax.lax.scan(step, m0, E[1:])
    return jnp.concatenate([m0[None], rest], axis=0)


def backtrack(M: jax.Array) -> jax.Array:
    """(H, W) cumulative energy -> (H,) int32 seam columns (leftmost-min ties)."""
    H, W = M.shape
    Mp = jnp.pad(M, ((0, 0), (1, 1)), constant_values=jnp.inf)
    j_last = jnp.argmin(M[-1]).astype(jnp.int32)

    def step(j, row_p):
        # padded window [j-1, j, j+1]; borders are +inf so never chosen
        win = jax.lax.dynamic_slice(row_p, (j,), (3,))
        j_new = j - 1 + jnp.argmin(win).astype(jnp.int32)
        return j_new, j_new

    _, seam_rev = jax.lax.scan(step, j_last, Mp[:-1][::-1])
    return jnp.concatenate([seam_rev[::-1], j_last[None]])


def find_seam(E: jax.Array) -> jax.Array:
    return backtrack(cumulative_energy(E))


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
