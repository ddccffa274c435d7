"""Spatially-sharded single-image carving — one huge image over a device mesh.

Config 5 of BASELINE.md: an 8K panorama column-sharded over N devices/hosts.
The reference has no analog (SURVEY §2 parallelism table); the constraints it
fixes are (a) the energy's sliding window needs a blocksize-wide column halo
(`src/render.c:146-151` geometry), and (b) liblqr's column-DP recurrence
(delta_x=1) must cross tile boundaries so seams stay globally optimal.

TPU-native design (`shard_map` over a 1-D mesh axis "x", columns sharded):

* energy   — one `ppermute` halo exchange (r-1 left cols / r right cols),
             then the SAME `energy_from_bands` core as single-device → the
             sharded energy is bitwise equal to the unsharded one.
* DP       — `lax.scan` over rows; each step exchanges ONE boundary value per
             direction via `ppermute` (the DP frontier), so the min-plus
             recurrence is exactly the global one.
* backtrack— the 3 candidate values at global columns j-1..j+1 are assembled
             with a masked `psum` (each global column is owned by exactly one
             shard), keeping the leftmost-min tie rule.
* removal  — per-shard select-shift compaction; the boundary pixel flows in
             from the right neighbor via `ppermute`.

The result is seam-for-seam identical to `ops.carve.carve_n_seams`
(asserted in tests/test_spatial.py), with collectives riding ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.dct import energy_from_bands
from .mesh import make_mesh

__all__ = ["spatial_carve_n_seams", "SpatialCarveResult"]


def _axis_index(axis):
    return jax.lax.axis_index(axis)


def _shift_from_left(x, axis):
    """Each shard receives x from its LEFT neighbor (shard 0 receives zeros)."""
    n = jax.lax.axis_size(axis)
    perm = [(i, i + 1) for i in range(n - 1)]
    return jax.lax.ppermute(x, axis, perm)


def _shift_from_right(x, axis):
    """Each shard receives x from its RIGHT neighbor (last shard gets zeros)."""
    n = jax.lax.axis_size(axis)
    perm = [(i + 1, i) for i in range(n - 1)]
    return jax.lax.ppermute(x, axis, perm)


def _halo_exchange_cols(local, n_left, n_right, axis):
    """Append neighbor column halos; global edges replicate the local edge
    (edge-clamp semantics, src/render.c:122-132)."""
    idx = _axis_index(axis)
    nsh = jax.lax.axis_size(axis)
    left_src = local[:, -n_left:] if n_left else None
    right_src = local[:, :n_right] if n_right else None
    parts = []
    if n_left:
        from_left = _shift_from_left(left_src, axis)
        # shard 0: replicate own first column
        edge = jnp.repeat(local[:, :1], n_left, axis=1)
        parts.append(jnp.where(idx == 0, edge, from_left))
    parts.append(local)
    if n_right:
        from_right = _shift_from_right(right_src, axis)
        edge = jnp.repeat(local[:, -1:], n_right, axis=1)
        parts.append(jnp.where(idx == nsh - 1, edge, from_right))
    return jnp.concatenate(parts, axis=1)


def _sharded_energy(local_luma, blocksize, edges, textures, axis):
    """(H, Wl) local luma -> (H, Wl) energy, bitwise equal to unsharded."""
    n = blocksize
    r = n // 2
    H, Wl = local_luma.shape
    ext = _halo_exchange_cols(local_luma, r - 1, r, axis)  # (H, Wl + n - 1)
    row_idx = jnp.clip(
        jnp.arange(H)[:, None] + jnp.arange(-r + 1, r + 1)[None, :], 0, H - 1
    )
    bands = ext[row_idx]  # (H, n, Wl + n - 1)
    return energy_from_bands(bands, n, edges, textures).astype(jnp.float32)


def _sharded_cumulative_energy(E_local, axis):
    """Row scan with per-step frontier exchange.  E_local: (H, Wl) f32."""
    idx = _axis_index(axis)
    nsh = jax.lax.axis_size(axis)
    inf = jnp.float32(jnp.inf)

    def step(prev, e_row):
        from_left = _shift_from_left(prev[-1:], axis)   # left neighbor's last M
        from_right = _shift_from_right(prev[:1], axis)  # right neighbor's first M
        lval = jnp.where(idx == 0, inf, from_left[0])
        rval = jnp.where(idx == nsh - 1, inf, from_right[0])
        left = jnp.concatenate([lval[None], prev[:-1]])
        right = jnp.concatenate([prev[1:], rval[None]])
        m = e_row + jnp.minimum(jnp.minimum(left, prev), right)
        return m, m

    m0 = E_local[0]
    _, rest = jax.lax.scan(step, m0, E_local[1:])
    return jnp.concatenate([m0[None], rest], axis=0)


def _owned_value(local_row, global_idx, lo, Wl, fill):
    """Value at a global column, assembled across shards by masked psum."""
    li = global_idx - lo
    valid = (li >= 0) & (li < Wl)
    v = jnp.where(valid, local_row[jnp.clip(li, 0, Wl - 1)], 0.0)
    return v, valid


def _sharded_backtrack(M_local, width, axis):
    """Global leftmost-min backtrack over the sharded cumulative energy."""
    H, Wl = M_local.shape
    idx = _axis_index(axis)
    lo = idx * Wl
    inf = jnp.float32(jnp.inf)

    # global argmin of the (masked) last row: leftmost min
    col_g = lo + jnp.arange(Wl)
    last = jnp.where(col_g < width, M_local[-1], inf)
    lmin = jnp.min(last)
    larg = lo + jnp.argmin(last)
    gmin = jax.lax.pmin(lmin, axis)
    # leftmost across shards: smallest global index among shards attaining gmin
    cand = jnp.where(lmin == gmin, larg, jnp.iinfo(jnp.int32).max)
    j_last = jax.lax.pmin(cand, axis).astype(jnp.int32)

    def step(j, row_local):
        cols = j - 1 + jnp.arange(3)
        li = cols - lo
        valid = (li >= 0) & (li < Wl)
        vals = jnp.where(valid, row_local[jnp.clip(li, 0, Wl - 1)], 0.0)
        vals = jax.lax.psum(vals, axis)
        vals = jnp.where((cols >= 0) & (cols < width), vals, inf)
        j_new = (j - 1 + jnp.argmin(vals)).astype(jnp.int32)
        return j_new, j_new

    _, seam_rev = jax.lax.scan(step, j_last, M_local[:-1][::-1])
    return jnp.concatenate([seam_rev[::-1], j_last[None]])  # replicated (H,)


def _sharded_remove(local, seam, axis):
    """Compaction with cross-boundary pixel flow.  local: (H, Wl[, C])."""
    H, Wl = local.shape[:2]
    idx = _axis_index(axis)
    lo = idx * Wl
    incoming = _shift_from_right(local[:, :1], axis)  # right neighbor's first col
    shifted = jnp.concatenate([local[:, 1:], incoming], axis=1)
    keep = (lo + jnp.arange(Wl))[None, :] < seam[:, None]
    if local.ndim == 3:
        keep = keep[..., None]
    return jnp.where(keep, local, shifted)


def _sharded_edge_fill(local_luma, width, axis):
    """Replicate the logical edge column (global width-1) into the dead region."""
    H, Wl = local_luma.shape
    idx = _axis_index(axis)
    lo = idx * Wl
    li = width - 1 - lo
    owned = (li >= 0) & (li < Wl)
    edge = jnp.where(owned, local_luma[:, jnp.clip(li, 0, Wl - 1)], 0.0)
    edge = jax.lax.psum(edge, axis)  # (H,) replicated
    col_g = (lo + jnp.arange(Wl))[None, :]
    return jnp.where(col_g < width, local_luma, edge[:, None])


class SpatialCarveResult:
    def __init__(self, vmap, width):
        self.vmap = vmap
        self.width = width


@functools.partial(
    jax.jit, static_argnames=("n_seams", "blocksize", "mesh", "axis")
)
def _spatial_carve_jit(luma, n_seams, blocksize, edges, textures, mesh, axis):
    H, W = luma.shape
    nsh = mesh.shape[axis]
    Wl = W // nsh

    def shard_fn(luma_l, origcol_l, vmap_l):
        idx = _axis_index(axis)
        lo = idx * Wl

        def body(i, state):
            luma_l, origcol_l, vmap_l, width = state
            E = _sharded_energy(luma_l, blocksize, edges, textures, axis)
            col_g = (lo + jnp.arange(Wl))[None, :]
            E = jnp.where(col_g < width, E, jnp.inf).astype(jnp.float32)
            M = _sharded_cumulative_energy(E, axis)
            seam = _sharded_backtrack(M, width, axis)  # (H,) global, replicated

            # record the k-th seam at original coordinates
            li = seam - lo
            rows = jnp.arange(H)
            owned = (li >= 0) & (li < Wl)
            orig = jnp.where(
                owned, origcol_l[rows, jnp.clip(li, 0, Wl - 1)], 0
            )
            orig = jax.lax.psum(orig, axis)  # global original column (H,)
            # scatter into the vmap shard that owns each original column
            oli = orig - lo
            v_owned = (oli >= 0) & (oli < Wl)
            upd_rows = rows
            upd_cols = jnp.clip(oli, 0, Wl - 1)
            cur = vmap_l[upd_rows, upd_cols]
            vmap_l = vmap_l.at[upd_rows, upd_cols].set(
                jnp.where(v_owned, i + 1, cur)
            )

            width = width - 1
            luma_l = _sharded_edge_fill(
                _sharded_remove(luma_l, seam, axis), width, axis
            )
            origcol_l = _sharded_remove(origcol_l, seam, axis)
            return (luma_l, origcol_l, vmap_l, width)

        width0 = jnp.asarray(W, jnp.int32)
        state = (luma_l, origcol_l, vmap_l, width0)
        luma_l, origcol_l, vmap_l, width = jax.lax.fori_loop(
            0, n_seams, body, state
        )
        return vmap_l, width[None]

    spec = P(None, axis)
    shard = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, P(axis)),
    )
    origcol = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32), (H, W))
    vmap0 = jnp.zeros((H, W), jnp.int32)
    vmap, widths = shard(luma, origcol, vmap0)
    return vmap, widths[0]


def spatial_carve_n_seams(
    luma,
    n_seams: int,
    *,
    blocksize: int = 8,
    edges: float = 0.0,
    textures: float = 1.0,
    mesh: Mesh | None = None,
    axis: str = "x",
) -> SpatialCarveResult:
    """Carve `n_seams` from one column-sharded image.  `luma` (H, W) with W
    divisible by the mesh size.  Returns the visibility map (original coords)
    and final width; seams are identical to the single-device path."""
    if mesh is None:
        mesh = make_mesh(axis_name=axis)
    W = luma.shape[1]
    nsh = mesh.shape[axis]
    if W % nsh:
        raise ValueError(f"width {W} not divisible by mesh size {nsh}")
    luma = jax.device_put(
        jnp.asarray(luma), NamedSharding(mesh, P(None, axis))
    )
    vmap, width = _spatial_carve_jit(
        luma, n_seams, blocksize, edges, textures, mesh, axis
    )
    return SpatialCarveResult(vmap, width)
