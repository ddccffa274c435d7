"""Pallas kernels for the spatially-sharded DP (parallel/spatial.py).

The sharded carve runs its min-plus recurrence in K-row blocks between halo
exchanges (collectives stay outside — Pallas kernels here are purely
per-shard local compute under `shard_map`).  The `lax.scan` forms cost one
XLA dispatch per row (~5 us at 8K: 4320 rows -> ~21 ms/seam just in DP);
these kernels unroll a whole K-row block into ONE kernel with the frontier
in registers, mirroring pallas/dp_kernel.py's fused forward.

Both kernels use only add/min/select/roll ops — no multiplies, so there is
no LLVM FMA-contraction noise and results are bitwise identical to the scan
forms on EVERY backend, including CPU interpret mode (asserted in
tests/test_spatial.py by running the sharded carve with the kernels forced
on).

Reference analog: the DP inside liblqr's `lqr_carver_resize`
(/root/reference/src/render.c:377, delta_x=1 rigidity=0 per :313), blocked
for the multi-device frontier exchange of SURVEY §5's long-context row.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dp_kernel import _interpret_default, _parent_select

__all__ = ["block_dp_rows", "block_dp_supported",
           "block_dp_parts_rows", "block_dp_parts_supported",
           "seg_walk_rows", "seg_walk_supported",
           "sharded_apply_rows", "apply_supported"]

LANE = 128


def _out_struct(shape, dtype, like):
    """ShapeDtypeStruct matching `like`'s varying-axes type — required for
    pallas_call outputs inside shard_map (check_vma)."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma is None:
        return jax.ShapeDtypeStruct(shape, dtype)
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def block_dp_supported(We: int, delta_x: int = 1) -> bool:
    return delta_x == 1 and We % LANE == 0


def _make_block_dp_kernel(Kb: int, We: int):
    # The window mask and the +inf LANE tail (rolls wrap through it, so the
    # two edge selects vanish from the dependent chain — see
    # dp_kernel._fused_seam_body) are both built IN-kernel from the raw
    # halo-gathered block: the mask select and tail concat sit on e_row,
    # which is off the critical min-chain, and the XLA-side mask/pad passes
    # (3 extra full-block copies per K rows) disappear.
    W2 = We + LANE

    def kernel(scal_ref, ext_ref, out_ref):
        col0 = scal_ref[0]
        width = scal_ref[1]
        inf = jnp.float32(jnp.inf)
        colids = jax.lax.broadcasted_iota(jnp.int32, (1, We), 1) + col0
        valid = (colids >= 0) & (colids < width)
        tail = jnp.full((1, LANE), inf, jnp.float32)
        prev = jnp.concatenate(
            [jnp.where(valid, ext_ref[0:1, :], inf), tail], axis=1)
        rows = []
        for r in range(Kb):  # static rows, frontier register-resident
            e_row = jnp.concatenate(
                [jnp.where(valid, ext_ref[r + 1 : r + 2, :], inf), tail],
                axis=1)
            left = pltpu.roll(prev, 1, axis=1)
            right = pltpu.roll(prev, W2 - 1, axis=1)  # == shift -1
            # same op order as the scan row: E + min(min(left, center), right)
            m = e_row + jnp.minimum(jnp.minimum(left, prev), right)
            rows.append(m[:, :We])
            prev = m
        out_ref[:, :] = jnp.concatenate(rows, axis=0)

    return kernel


def block_dp_rows(ext_msg: jax.Array, col0, width, *,
                  interpret: bool | None = None) -> jax.Array:
    """One K-row DP block from the RAW halo-gathered message: ext_msg
    (Kb+1, We) f32 with row 0 = the frontier and rows 1.. = the energy
    block, col0 = the global column of ext column 0, width = the logical
    width.  Masking to the valid window and the inf-tail widening happen
    inside the kernel.  Returns (Kb, We) f32 M rows, bitwise identical to
    the masked per-row scan (add/min only).  We % 128 == 0 required
    (`block_dp_supported`)."""
    Kb1, We = ext_msg.shape
    Kb = Kb1 - 1
    if interpret is None:
        interpret = _interpret_default()
    scal = jnp.stack([jnp.asarray(col0, jnp.int32),
                      jnp.asarray(width, jnp.int32)])
    if interpret:
        # same op sequence in plain jax (jnp.roll == pltpu.roll semantics;
        # add/min are exact, so this is bitwise-equivalent to the compiled
        # kernel) — the pallas interpreter cannot run grid carries under
        # shard_map's vma checking
        return _plain_block_dp(ext_msg, scal[0], scal[1], Kb)
    return pl.pallas_call(
        _make_block_dp_kernel(Kb, We),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=_out_struct((Kb, We), jnp.float32, ext_msg),
        interpret=False,
    )(scal, ext_msg)


def block_dp_parts_supported(Wl: int, Hh: int, delta_x: int = 1) -> bool:
    return delta_x == 1 and Wl % LANE == 0 and Hh % LANE == 0


def _make_block_dp_parts_kernel(Kb: int, Wl: int, Hh: int):
    """Like `_make_block_dp_kernel` but the halo-extended rows are BUILT IN
    VMEM from four separate operands (frontier, energy block, left/right
    sliced halos) — the XLA-side (Kb+1, We) message concat and extended-
    buffer materialization (~2 full-image passes per seam at 8K) vanish.
    Requires lane-aligned Wl and Hh so the in-kernel concats are free."""
    We = Wl + 2 * Hh
    W2 = We + LANE

    def kernel(scal_ref, prev_ref, e_ref, lh_ref, rh_ref, out_ref):
        col0 = scal_ref[0]
        width = scal_ref[1]
        inf = jnp.float32(jnp.inf)
        colids = jax.lax.broadcasted_iota(jnp.int32, (1, We), 1) + col0
        valid = (colids >= 0) & (colids < width)
        tail = jnp.full((1, LANE), inf, jnp.float32)

        def ext_row(left, center, right):
            row = jnp.concatenate([left, center, right], axis=1)
            return jnp.concatenate([jnp.where(valid, row, inf), tail],
                                   axis=1)

        prev = ext_row(lh_ref[0:1, :], prev_ref[0:1, :], rh_ref[0:1, :])
        rows = []
        for r in range(Kb):  # static rows, frontier register-resident
            e_row = ext_row(lh_ref[r + 1:r + 2, :], e_ref[r:r + 1, :],
                            rh_ref[r + 1:r + 2, :])
            left = pltpu.roll(prev, 1, axis=1)
            right = pltpu.roll(prev, W2 - 1, axis=1)  # == shift -1
            m = e_row + jnp.minimum(jnp.minimum(left, prev), right)
            rows.append(m[:, :We])
            prev = m
        out_ref[:, :] = jnp.concatenate(rows, axis=0)

    return kernel


def block_dp_parts_rows(prev: jax.Array, E_blk: jax.Array, lh: jax.Array,
                        rh: jax.Array, col0, width, *,
                        interpret: bool | None = None) -> jax.Array:
    """One K-row DP block from separate operands: prev (1, Wl) frontier,
    E_blk (Kb, Wl), lh/rh (Kb+1, Hh) neighbor halo slices (row 0 = the
    frontier's halo).  Returns (Kb, Wl + 2*Hh) M rows — bitwise identical
    to `block_dp_rows` on the concatenated message (identical values in
    identical positions; add/min only)."""
    Kb, Wl = E_blk.shape
    Hh = lh.shape[1]
    if interpret is None:
        interpret = _interpret_default()
    scal = jnp.stack([jnp.asarray(col0, jnp.int32),
                      jnp.asarray(width, jnp.int32)])
    if interpret:
        msg = jnp.concatenate([prev[None, :] if prev.ndim == 1 else prev,
                               E_blk], axis=0)
        ext = jnp.concatenate([lh, msg, rh], axis=1)
        return _plain_block_dp(ext, scal[0], scal[1], Kb)
    prev2 = prev[None, :] if prev.ndim == 1 else prev
    return pl.pallas_call(
        _make_block_dp_parts_kernel(Kb, Wl, Hh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=_out_struct((Kb, Wl + 2 * Hh), jnp.float32, E_blk),
        interpret=False,
    )(scal, prev2, E_blk, lh, rh)


def _plain_block_dp(ext_msg, col0, width, Kb):
    We = ext_msg.shape[1]
    W2 = We + LANE
    inf = jnp.float32(jnp.inf)
    colids = jnp.arange(We, dtype=jnp.int32)[None, :] + col0
    valid = (colids >= 0) & (colids < width)
    tail = jnp.full((1, LANE), inf, jnp.float32)
    prev = jnp.concatenate(
        [jnp.where(valid, ext_msg[0:1, :], inf), tail], axis=1)
    rows = []
    for r in range(Kb):
        e_row = jnp.concatenate(
            [jnp.where(valid, ext_msg[r + 1 : r + 2, :], inf), tail], axis=1)
        left = jnp.roll(prev, 1, axis=1)
        right = jnp.roll(prev, W2 - 1, axis=1)
        m = e_row + jnp.minimum(jnp.minimum(left, prev), right)
        rows.append(m[:, :We])
        prev = m
    return jnp.concatenate(rows, axis=0)


# ---------------------------------------------------------------- backtrack --

def seg_walk_supported(K: int, delta_x: int = 1) -> bool:
    return delta_x == 1 and 2 * K + 1 <= 2 * LANE


def _make_seg_walk_kernel(Kb: int, ww: int, j0: int, CW: int,
                          rightmost: bool = False):

    def kernel(win_ref, seg_ref):
        inf = jnp.float32(jnp.inf)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, CW), 1)
        colsb = jax.lax.broadcasted_iota(jnp.int32, (Kb, CW), 1)
        wp = jnp.where(colsb < ww, win_ref[:, :], inf)
        # vectorized per-cell parent direction — identical tie rules to the
        # scalar 3-window argmin (tie-most min): see dp_kernel forward
        left = jnp.where(colsb == 0, inf, pltpu.roll(wp, 1, axis=1))
        right = jnp.where(colsb == CW - 1, inf,
                          pltpu.roll(wp, CW - 1, axis=1))
        pall = _parent_select(left, wp, right, rightmost)
        o = (cols == j0).astype(jnp.int32)
        rows = []
        for r in range(Kb - 1, -1, -1):  # bottom-up, static
            pr = pall[r : r + 1, :]
            o = (pltpu.roll(o * (pr == -1), CW - 1, axis=1)
                 + o * (pr == 0)
                 + pltpu.roll(o * (pr == 1), 1, axis=1))
            rows.append(jnp.max(o * cols, axis=1, keepdims=True))
        seg_ref[:, :] = jnp.concatenate(rows[::-1], axis=0)

    return kernel


def seg_walk_rows(win: jax.Array, j0: int, *,
                  interpret: bool | None = None,
                  tie: str = "leftmost") -> jax.Array:
    """Backtrack one segment: win (Kb, ww) f32 M-rows (ww = 2K+1 <= 128),
    starting at local position `j0` below the last row -> (Kb,) i32 local
    positions, walking bottom-up with the tie-most-min 3-window rule.
    Bitwise identical to the scalar dynamic-slice scan."""
    Kb, ww = win.shape
    if interpret is None:
        interpret = _interpret_default()
    CW = LANE if ww <= LANE else 2 * LANE
    winp = jnp.pad(win, ((0, 0), (0, CW - ww)),
                   constant_values=jnp.inf)
    seg = pl.pallas_call(
        _make_seg_walk_kernel(Kb, ww, j0, CW, tie == "rightmost"),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=_out_struct((Kb, 1), jnp.int32, win),
        interpret=interpret,
    )(winp)
    return seg[:, 0]


# ------------------------------------------------------------ fused apply ---

def apply_supported(H: int, Wl: int) -> bool:
    return H % 8 == 0 and Wl % LANE == 0


def _apply_row_block(H: int, Wl: int) -> int:
    # 3 big in + 3 big out (R, Wl) f32 buffers per block; outputs are
    # aliased onto the inputs, so the pipeline's double-buffered footprint
    # is ~2 * 6 * R * Wl * 4.  Taller blocks cut the per-grid-step overhead
    # (the kernel is DMA-floor-bound otherwise).
    for R in (128, 120, 96, 80, 72, 64, 56, 48, 40, 32, 24, 16, 8):
        if H % R == 0 and 12 * R * Wl * 4 <= 15 * 1024 * 1024:
            return R
    return 8


def _make_sharded_apply_kernel(Wl: int):
    def kernel(scal_ref, seam_ref, edge_ref, inc_ref, luma_ref, oc_ref,
               e_ref, luma_out, oc_out, e_out, orig_out):
        new_width = scal_ref[0]
        lo = scal_ref[1]
        R = luma_ref.shape[0]
        colids = jax.lax.broadcasted_iota(jnp.int32, (1, Wl), 1)
        col_g = lo + colids
        seam_blk = seam_ref[:, :]          # (R, 1) i32
        keep = col_g < seam_blk
        last = colids == Wl - 1

        def compact(x, inc_col):
            sh = pltpu.roll(x, Wl - 1, axis=1)
            sh = jnp.where(last, inc_col, sh)
            return jnp.where(keep, x, sh)

        luma = compact(luma_ref[:, :], inc_ref[:, 0:1])
        luma_out[:, :] = jnp.where(col_g >= new_width, edge_ref[:, :], luma)
        e_out[:, :] = compact(e_ref[:, :], inc_ref[:, 1:2])
        oc_i = oc_ref[:, :]
        # side output: the removed pixel's ORIGINAL column (vmap record) —
        # the pre-compaction oc block is already in VMEM, so the one-hot
        # reduction is free vs the separate full-buffer pass it replaces
        orig_out[:, :] = jnp.sum(
            jnp.where(col_g == seam_blk, oc_i, 0), axis=1, keepdims=True)
        inc_oc = pltpu.bitcast(inc_ref[:, 2:3], jnp.int32)
        sh = pltpu.roll(oc_i, Wl - 1, axis=1)
        sh = jnp.where(last, inc_oc, sh)
        oc_out[:, :] = jnp.where(keep, oc_i, sh)

    return kernel


def sharded_apply_rows(luma, oc, E, seam, edge, incoming, new_width, lo, *,
                       interpret: bool | None = None):
    """Per-shard fused seam application: compact luma/origcol/energy around
    `seam` and edge-fill the luma dead region, in ONE read+write pass per
    buffer (the XLA form is 3 roll+select passes + an edge-fill pass).

    luma/E (H, Wl) f32, oc (H, Wl) i32, seam (H,) i32 GLOBAL columns,
    edge (H,) f32 new-edge fill value, incoming (H, 3) f32 the right
    neighbor's first column of [luma, E, bitcast(origcol)], new_width () i32
    (logical width AFTER removal), lo () i32 this shard's first global
    column.  Bitwise identical to _sharded_remove + _sharded_edge_fill.

    Returns (luma', oc', E_shift, orig_partial) — orig_partial (H, 1) i32 is
    the per-shard one-hot partial of the removed pixel's ORIGINAL column
    (psum it over the axis for the vmap record)."""
    H, Wl = luma.shape
    if interpret is None:
        interpret = _interpret_default()
    scal = jnp.stack([jnp.asarray(new_width, jnp.int32),
                      jnp.asarray(lo, jnp.int32)])
    if interpret:
        return _plain_sharded_apply(luma, oc, E, seam, edge, incoming,
                                    scal[0], scal[1])
    R = _apply_row_block(H, Wl)
    nb = H // R
    blk = lambda g: (g, 0)
    outs = pl.pallas_call(
        _make_sharded_apply_kernel(Wl),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 3), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Wl), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Wl), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Wl), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, Wl), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Wl), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Wl), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), blk, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _out_struct((H, Wl), jnp.float32, luma),
            _out_struct((H, Wl), jnp.int32, luma),
            _out_struct((H, Wl), jnp.float32, luma),
            _out_struct((H, 1), jnp.int32, luma),
        ],
        # in-place: each block's outputs overwrite its own already-consumed
        # input block (compaction reads only within the block), halving the
        # VMEM footprint and letting XLA drop the 3 fresh output allocations
        input_output_aliases={4: 0, 5: 1, 6: 2},
        interpret=False,
    )(scal, seam[:, None], edge[:, None], incoming, luma, oc, E)
    return outs


def _plain_sharded_apply(luma, oc, E, seam, edge, incoming, new_width, lo):
    """Same op sequence as the kernel in plain jax (roll/select only — exact
    on every backend)."""
    H, Wl = luma.shape
    colids = jnp.arange(Wl, dtype=jnp.int32)[None, :]
    col_g = lo + colids
    keep = col_g < seam[:, None]
    last = colids == Wl - 1

    def compact(x, inc_col):
        sh = jnp.roll(x, -1, axis=1)
        sh = jnp.where(last, inc_col, sh)
        return jnp.where(keep, x, sh)

    luma_c = compact(luma, incoming[:, 0:1])
    luma_o = jnp.where(col_g >= new_width, edge[:, None], luma_c)
    e_o = compact(E, incoming[:, 1:2])
    inc_oc = jax.lax.bitcast_convert_type(incoming[:, 2:3], jnp.int32)
    sh = jnp.roll(oc, -1, axis=1)
    sh = jnp.where(last, inc_oc, sh)
    oc_o = jnp.where(keep, oc, sh)
    orig_p = jnp.sum(jnp.where(col_g == seam[:, None], oc, 0), axis=1,
                     keepdims=True)
    return luma_o, oc_o, e_o, orig_p
