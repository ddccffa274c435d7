"""Pallas TPU kernels for the seam DP — the hot loop of the carve.

Why a kernel: `lax.scan` over H rows costs per-step loop overhead and keeps
the carry in HBM-visible buffers; at 1080p that is ~1000 tiny sequential
steps per seam.  Here the whole forward DP runs inside ONE kernel: the
frontier row lives in VMEM scratch (persisting across sequential TPU grid
steps), energy rows stream in via pipelined block DMAs, and the kernel emits
compact int8 parent pointers (-1/0/+1) instead of the full f32 M matrix —
4x less HBM write traffic and no per-row dispatch.

Semantics are identical to ops/dp.py (same f32 op order: E + min(min(l,c),r);
leftmost-min parent ties; leftmost argmin of the masked last row), so the
Pallas path is bitwise interchangeable with the scan path — asserted in
tests/test_pallas.py (kernels run in interpreter mode on CPU).

Reference analog: the DP inside liblqr's `lqr_carver_resize`
(/root/reference/src/render.c:377, delta_x=1 rigidity=0 per :313).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["find_seam_pallas", "dp_forward", "dp_backtrack", "pallas_supported"]

ROW_BLOCK = 8  # rows per grid step; must divide H
LANE = 128     # W must be padded to a multiple of the lane count


def pallas_supported(H: int, W: int) -> bool:
    return H % ROW_BLOCK == 0 and W % LANE == 0


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _parent_select(left, prev, right, rightmost: bool):
    """Vectorized parent direction (-1/0/+1) with the `tie`-most-min rule —
    identical decisions to _argmin_tie over the 3-candidate window (the
    S1/S2 spec knob, docs/PARITY.md)."""
    if not rightmost:
        return jnp.where(
            left <= prev,
            jnp.where(left <= right, -1, 1),
            jnp.where(prev <= right, 0, 1),
        )
    return jnp.where(
        right <= prev,
        jnp.where(right <= left, 1, -1),
        jnp.where(prev <= left, 0, -1),
    )


def _last_row_arg(m_last, colids, mn, rightmost: bool):
    """Column of the `tie`-most minimum of the masked last row."""
    if not rightmost:
        big = jnp.int32(jnp.iinfo(jnp.int32).max)
        return jnp.min(jnp.where(m_last == mn, colids, big))
    return jnp.max(jnp.where(m_last == mn, colids, jnp.int32(-1)))


# ----------------------------------------------------------------- forward --

def _make_dp_forward_kernel(rightmost: bool):
    def kernel(width_ref, e_ref, parents_ref, mlast_ref, carry):
        """DP over the column window [lo, lo+width); cols outside are +inf.

        The left window edge needs no special-casing: masked cells carry
        inf, so the left/right candidates at the window borders are inf
        automatically; the `colids == 0 / W-1` guards only fix the roll
        wraparound at the physical buffer edges."""
        b = pl.program_id(0)
        R, W = e_ref.shape
        colids = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        inf = jnp.float32(jnp.inf)
        width = width_ref[0]
        lo = width_ref[1]

        def row_fn(r, _):
            e_row = e_ref[pl.ds(r, 1), :]
            e_row = jnp.where(
                (colids >= lo) & (colids < lo + width), e_row, inf
            )
            prev = carry[:]
            left = pltpu.roll(prev, 1, axis=1)
            right = pltpu.roll(prev, W - 1, axis=1)  # == shift -1 (>= 0)
            left = jnp.where(colids == 0, inf, left)
            right = jnp.where(colids == W - 1, inf, right)
            # same op order as ops/dp.py: E + min(min(left, center), right)
            m = e_row + jnp.minimum(jnp.minimum(left, prev), right)
            # tie-most-min predecessor (matches oracle.backtrack_seam ties)
            p = _parent_select(left, prev, right, rightmost).astype(jnp.int32)
            is_first = jnp.logical_and(b == 0, r == 0)
            m = jnp.where(is_first, e_row, m)
            p = jnp.where(is_first, 0, p)
            carry[:] = m
            parents_ref[pl.ds(r, 1), :] = p.astype(parents_ref.dtype)
            return 0

        jax.lax.fori_loop(0, R, row_fn, 0, unroll=True)
        mlast_ref[:] = carry[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "tie"))
def dp_forward(E: jax.Array, width: jax.Array, lo: jax.Array = 0, *,
               interpret: bool | None = None, tie: str = "leftmost"):
    """E (H, W) f32, W % 128 == 0, H % ROW_BLOCK == 0; the DP runs over the
    column window [lo, lo+width) (other cols masked to +inf).

    Returns (parents (H, W) int8, m_last (1, W) f32)."""
    H, W = E.shape
    if interpret is None:
        interpret = _interpret_default()
    grid = (H // ROW_BLOCK,)
    wl = jnp.stack([jnp.asarray(width, jnp.int32), jnp.asarray(lo, jnp.int32)])
    return pl.pallas_call(
        _make_dp_forward_kernel(tie == "rightmost"),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_BLOCK, W), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROW_BLOCK, W), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, W), jnp.int8),
            jax.ShapeDtypeStruct((1, W), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, W), jnp.float32)],
        interpret=interpret,
    )(wl, E)


# --------------------------------------------------------------- backtrack --

def _backtrack_kernel(jlast_ref, parents_ref, seam_ref, jcarry):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    R, W = parents_ref.shape
    colids = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

    @pl.when(b == 0)
    def _():
        jcarry[0] = jlast_ref[0]

    def row_fn(rr, _):
        r = R - 1 - rr  # iterate block rows bottom-up
        j = jcarry[0]
        # (1,1) vector store — scalar stores to VMEM are not lowerable
        seam_ref[pl.ds(r, 1), :] = jnp.full((1, 1), j, jnp.int32)
        # p = parents[r, j] via one-hot reduction (no dynamic lane indexing)
        p_row = parents_ref[pl.ds(r, 1), :].astype(jnp.int32)
        p = jnp.sum(jnp.where(colids == j, p_row, 0))
        jcarry[0] = j + p
        return 0

    jax.lax.fori_loop(0, R, row_fn, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dp_backtrack(parents: jax.Array, j_last: jax.Array, *,
                 interpret: bool | None = None) -> jax.Array:
    """parents (H, W) int8, j_last () int32 -> seam (H,) int32.

    Walks bottom-up; blocks stream in reverse via the index map.
    NOTE the final carry after row 0 is parents[0]-adjusted, but row 0's
    parent is 0 by construction, so seam[0] is recorded correctly."""
    H, W = parents.shape
    if interpret is None:
        interpret = _interpret_default()
    nb = H // ROW_BLOCK
    seam2d = pl.pallas_call(
        _backtrack_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_BLOCK, W), lambda b: (nb - 1 - b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, 1), lambda b: (nb - 1 - b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, 1), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray(j_last, jnp.int32).reshape(1), parents)
    return seam2d[:, 0]


# ------------------------------------------- fused forward+backtrack kernel --

# parents for the whole image persist in VMEM scratch — bound the footprint
# (int8 H*W) to stay well inside the ~16 MB/core VMEM budget
MAX_FUSED_PARENT_BYTES = 12 * 1024 * 1024


def fused_seam_supported(H: int, W: int) -> bool:
    return pallas_supported(H, W) and H * W <= MAX_FUSED_PARENT_BYTES


def _make_fused_seam_kernel(nb: int, rightmost: bool = False):
    """One kernel per seam (batch-aware: grid step g = image e = g // nb,
    row block b = g % nb): forward DP into VMEM-resident parents; on the
    image's last grid step, masked leftmost argmin of the frontier + full
    backtrack.  The parents/carry scratch is reused image-to-image (reset at
    b == 0), so a batch is just more grid steps — this is the flattened form
    `jax.vmap` routes to (custom_vmap), like pallas/energy_kernel.py.

    Decisions are bitwise-identical to dp_forward + XLA argmin + dp_backtrack
    (same op order, same leftmost-min tie rules).  Two latency optimizations
    (values unchanged):
      * the forward frontier is register-resident across the R unrolled rows
        of a block — carry VMEM round-trips happen once per block, not per
        row (the row recurrence is latency-bound, not bandwidth-bound);
      * the backtrack walks a one-hot VECTOR through a 256-lane window
        around the seam instead of scalar-reducing a full-W one-hot per row
        (the seam drifts <= 1 column/row, so an R-row block stays inside the
        window; per-row work is then ~2 vregs with no cross-lane reduce)."""

    def kernel(width_ref, e_ref, seam_ref, parents, carry):
        g = pl.program_id(0)
        e = g // nb
        b = g % nb
        R, W = e_ref.shape
        colids = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        inf = jnp.float32(jnp.inf)
        width = width_ref[e, 0]
        lo = width_ref[e, 1]
        in_win = (colids >= lo) & (colids < lo + width)
        return _fused_seam_body(
            b, nb, R, W, colids, inf, width, lo, in_win,
            e_ref, seam_ref, parents, carry, rightmost,
        )

    return kernel


def _fused_seam_body(b, nb, R, W, colids, inf, width, lo, in_win,
                     e_ref, seam_ref, parents, carry, rightmost=False):
    # The carry rows are WIDENED by one 128-lane group of permanent +inf
    # dead columns (W2 = W + 128).  The lane rolls then wrap through that
    # tail: left[0] = prev[W2-1] = inf and right[W2-1] lands in the dead
    # region, so the two edge-masking selects that used to sit on the
    # latency-bound dependent chain vanish — chain depth per row drops from
    # 7 ops to 4 (roll || roll -> min -> min -> add).  Values for columns
    # < W are bitwise-unchanged (rows >= 1 read the same +inf; row 0's
    # parents are never consulted).
    W2 = W + LANE

    # Zero-init instead of special-casing row 0: m0 = e0 + min(0, 0, 0) =
    # e0 + 0.0 — value-identical to e0 (only the sign of exact zeros can
    # differ, which no comparison downstream distinguishes), and row 0's
    # parent is never consulted by the backtrack.
    @pl.when(b == 0)
    def _():
        carry[:] = jnp.zeros((1, W2), jnp.float32)

    colids2 = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1)
    in_win2 = (colids2 >= lo) & (colids2 < lo + width)
    eblk = jnp.concatenate(
        [e_ref[:, :], jnp.full((R, LANE), inf, jnp.float32)], axis=1
    )  # one block load + tail; rows sliced statically below
    prev = carry[:]
    pb = []
    for r in range(R):  # static rows within the block
        e_row = jnp.where(in_win2, eblk[r : r + 1, :], inf)
        left = pltpu.roll(prev, 1, axis=1)
        right = pltpu.roll(prev, W2 - 1, axis=1)  # == shift -1
        m = e_row + jnp.minimum(jnp.minimum(left, prev), right)
        p = _parent_select(left, prev, right, rightmost).astype(jnp.int32)
        prev = m
        pb.append(p[:, :W].astype(jnp.int8))
    carry[:] = prev
    parents[pl.ds(pl.multiple_of(b * R, 8), R), :] = jnp.concatenate(pb, axis=0)

    @pl.when(b == nb - 1)
    def _backtrack():
        m_last = jnp.where(in_win, carry[:, :W], inf)
        mn = jnp.min(m_last)
        j0 = _last_row_arg(m_last, colids, mn, rightmost)

        H = parents.shape[0]
        # walk in the largest 8-multiple stride that divides H: the
        # sequential fori has per-step overhead, so fewer/taller blocks win
        # (the 256-lane window still bounds the drift: 127 + 2*BR <= 255)
        BR = next(s for s in (64, 56, 48, 40, 32, 24, 16, 8) if H % s == 0)
        nbb = H // BR
        narrow = W >= 256
        CW = 256 if narrow else W
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, CW), 1)

        def blk_fn(bbr, j):
            bb = nbb - 1 - bbr  # blocks bottom-up
            base = pl.multiple_of(bb * BR, 8)
            if narrow:
                # within the block j spans [j-BR, j+BR]; cb <= j-BR (when not
                # clipped) and cb >= j-BR-127, so j-cb stays in [0, 128+2BR)
                # and the one-hot never wraps at the window edges
                cb = jnp.clip(((j - BR) // 128) * 128, 0, W - 256)
                cb = pl.multiple_of(cb, 128)
                tile = parents[pl.ds(base, BR), pl.ds(cb, 256)].astype(jnp.int32)
            else:
                cb = jnp.int32(0)
                tile = parents[pl.ds(base, BR), :].astype(jnp.int32)  # (BR, W)
            o = (cols == j - cb).astype(jnp.int32)
            ohs = []
            for r in range(BR - 1, -1, -1):  # rows bottom-up, static
                ohs.append(o)
                pr = tile[r : r + 1, :]
                o = (pltpu.roll(o * (pr == -1).astype(jnp.int32), CW - 1, axis=1)
                     + o * (pr == 0).astype(jnp.int32)
                     + pltpu.roll(o * (pr == 1).astype(jnp.int32), 1, axis=1))
            oh = jnp.concatenate(ohs[::-1], axis=0)  # (BR, CW) one-hot rows
            js = jnp.max(oh * jnp.broadcast_to(cols, (BR, CW)), axis=1,
                         keepdims=True)
            seam_ref[pl.ds(base, BR), :] = js + cb
            # entry column for the block above = position of the walked o
            return jnp.max(o * (cols + cb))

        jax.lax.fori_loop(0, nbb, blk_fn, j0)


@functools.partial(jax.jit, static_argnames=("interpret", "tie"))
def _fused_find_seam_batched(E: jax.Array, width: jax.Array, lo: jax.Array, *,
                             interpret: bool | None = None,
                             tie: str = "leftmost") -> jax.Array:
    """E (B, H, W) f32, width/lo (B,) i32 -> (B, H) i32 seams.  One flattened
    kernel launch: grid (B * H/ROW_BLOCK), parents scratch reused per image."""
    B, H, W = E.shape
    if interpret is None:
        interpret = _interpret_default()
    nb = H // ROW_BLOCK
    wl = jnp.stack([
        jnp.broadcast_to(jnp.asarray(width, jnp.int32), (B,)),
        jnp.broadcast_to(jnp.asarray(lo, jnp.int32), (B,)),
    ], axis=1)
    seam2d = pl.pallas_call(
        _make_fused_seam_kernel(nb, tie == "rightmost"),
        grid=(B * nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_BLOCK, W), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((H, 1), lambda g: (g // nb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((H, W), jnp.int8),
            pltpu.VMEM((1, W + LANE), jnp.float32),  # widened inf tail
        ],
        interpret=interpret,
    )(wl, E.reshape(B * H, W))
    return seam2d.reshape(B, H)


@functools.lru_cache(maxsize=None)
def _find_seam_cv(interpret: bool | None, tie: str = "leftmost"):
    """custom_vmap wrapper: `jax.vmap` maps to the flattened batched kernel
    instead of the (Mosaic-unsupported) generic batched BlockSpec rule."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(E, width, lo):
        return _fused_find_seam_batched(
            E[None], width, lo, interpret=interpret, tie=tie
        )[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, E, width, lo):
        from .batch_dp_kernel import find_seams_vec, vec_supported

        E_b, w_b, lo_b = in_batched
        if not E_b:
            E = jnp.broadcast_to(E[None], (axis_size, *E.shape))
        width = jnp.broadcast_to(jnp.asarray(width, jnp.int32), (axis_size,))
        lo = jnp.broadcast_to(jnp.asarray(lo, jnp.int32), (axis_size,))
        B, H, W = E.shape
        if vec_supported(B, H, W):
            # batch packed into sublanes: one VPU recurrence step advances
            # every image's DP row (serial chain H instead of B*H)
            return find_seams_vec(E, width, lo, interpret=interpret,
                                  tie=tie), True
        return _fused_find_seam_batched(E, width, lo, interpret=interpret,
                                        tie=tie), True

    return f


# --------------------------------------------- folded (sublane-packed) DP --
#
# The fused kernel's forward runs the row recurrence on (1, W) vectors: each
# VPU op touches W/128 vregs at 1/8 sublane utilization, and the recurrence
# is a LATENCY-bound dependent chain (~55% of the production seam time, see
# bench stage budget).  Folding each row into (8, W/8) packs the same W
# columns into full vregs, cutting the operand size (and the dependent-op
# latency) ~8x.  The fold is a free row-major reshape; the cross-chunk
# neighbor terms are one extra sublane roll + select per side.  Parents
# stream to HBM in folded layout and reshape back (also free) for the
# windowed backtrack kernel.

FOLD = 8


def _pick_row_block(H: int) -> int:
    return next(s for s in (64, 56, 48, 40, 32, 24, 16, 8) if H % s == 0)


def _make_folded_dp_kernel(R: int, F: int, Wf: int, rightmost: bool = False):
    def kernel(wl_ref, e_ref, parents_ref, mlast_ref, carry):
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        sub = jax.lax.broadcasted_iota(jnp.int32, (F, Wf), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (F, Wf), 1)
        colids = sub * Wf + lane           # global column of (chunk, lane)
        inf = jnp.float32(jnp.inf)
        width = wl_ref[0]
        lo = wl_ref[1]
        in_win = (colids >= lo) & (colids < lo + width)
        lane0 = lane == 0
        laneL = lane == Wf - 1
        first = lane0 & (sub == 0)         # global column 0
        last = laneL & (sub == F - 1)      # global column W-1

        @pl.when(b == 0)
        def _():
            # m0 = e0 + min(0,0,0) = e0 in every comparison (see above)
            carry[:] = jnp.zeros((F, Wf), jnp.float32)

        eblk = e_ref[:, :]                 # (R*F, Wf)
        prev = carry[:]
        pb = []
        for r in range(R):                 # static image-rows per block
            e_row = jnp.where(in_win, eblk[r * F:(r + 1) * F, :], inf)
            # left neighbor (col-1): lane roll; lane 0 takes (chunk-1, Wf-1)
            a = pltpu.roll(prev, 1, axis=1)
            a2 = pltpu.roll(a, 1, axis=0)
            left = jnp.where(first, inf, jnp.where(lane0, a2, a))
            # right neighbor (col+1): lane Wf-1 takes (chunk+1, 0)
            c = pltpu.roll(prev, Wf - 1, axis=1)
            c2 = pltpu.roll(c, F - 1, axis=0)
            right = jnp.where(last, inf, jnp.where(laneL, c2, c))
            m = e_row + jnp.minimum(jnp.minimum(left, prev), right)
            p = _parent_select(left, prev, right, rightmost).astype(jnp.int8)
            prev = m
            pb.append(p)
        carry[:] = prev
        parents_ref[:, :] = jnp.concatenate(pb, axis=0)

        @pl.when(b == nb - 1)
        def _():
            mlast_ref[:, :] = carry[:]

    return kernel


def _make_window_bt_kernel(BR: int):
    """Standalone windowed backtrack over (H, W) int8 parents: the seam
    drifts <= 1 col/row, so each BR-row block walks a one-hot vector through
    a 256-lane window (same math as the fused kernel's backtrack)."""

    def kernel(jlast_ref, p_ref, seam_ref, jcarry):
        g = pl.program_id(0)
        BRr, W = p_ref.shape
        narrow = W >= 256
        CW = 256 if narrow else W
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, CW), 1)

        @pl.when(g == 0)
        def _():
            jcarry[0] = jlast_ref[0]

        j = jcarry[0]
        if narrow:
            cb = jnp.clip(((j - BR) // 128) * 128, 0, W - 256)
            cb = pl.multiple_of(cb, 128)
            tile = p_ref[:, pl.ds(cb, 256)].astype(jnp.int32)
        else:
            cb = jnp.int32(0)
            tile = p_ref[:, :].astype(jnp.int32)
        o = (cols == j - cb).astype(jnp.int32)
        ohs = []
        for r in range(BR - 1, -1, -1):    # rows bottom-up, static
            ohs.append(o)
            pr = tile[r:r + 1, :]
            o = (pltpu.roll(o * (pr == -1), CW - 1, axis=1)
                 + o * (pr == 0)
                 + pltpu.roll(o * (pr == 1), 1, axis=1))
        oh = jnp.concatenate(ohs[::-1], axis=0)
        js = jnp.max(oh * jnp.broadcast_to(cols, (BR, CW)), axis=1,
                     keepdims=True)
        seam_ref[:, :] = js + cb
        jcarry[0] = jnp.max(o * (cols + cb))

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "tie"))
def _folded_find_seam(E: jax.Array, width: jax.Array, lo: jax.Array, *,
                      interpret: bool | None = None,
                      tie: str = "leftmost") -> jax.Array:
    """Folded forward + windowed backtrack; decisions bitwise-identical to
    `_fused_find_seam` (same op order and tie rules on the same values)."""
    H, W = E.shape
    if interpret is None:
        interpret = _interpret_default()
    F = FOLD
    Wf = W // F
    R = _pick_row_block(H)
    wl = jnp.stack([jnp.asarray(width, jnp.int32), jnp.asarray(lo, jnp.int32)])

    parents_f, mlast_f = pl.pallas_call(
        _make_folded_dp_kernel(R, F, Wf, tie == "rightmost"),
        grid=(H // R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R * F, Wf), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R * F, Wf), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, Wf), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H * F, Wf), jnp.int8),
            jax.ShapeDtypeStruct((F, Wf), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((F, Wf), jnp.float32)],
        interpret=interpret,
    )(wl, E.reshape(H * F, Wf))

    parents = parents_f.reshape(H, W)      # free row-major unfold
    mlast = mlast_f.reshape(1, W)
    col = jnp.arange(W)
    masked = jnp.where((col >= lo) & (col < lo + width), mlast[0], jnp.inf)
    from ..ops.dp import _argmin_tie

    j_last = _argmin_tie(masked, tie)

    BR = _pick_row_block(H)
    seam2d = pl.pallas_call(
        _make_window_bt_kernel(BR),
        grid=(H // BR,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BR, W), lambda g: (H // BR - 1 - g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BR, 1), lambda g: (H // BR - 1 - g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, 1), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(j_last.reshape(1), parents)
    return seam2d[:, 0]


# ------------------------------------------------------------------ driver --

def find_seam_pallas(E: jax.Array, width: jax.Array, lo: jax.Array = 0, *,
                     interpret: bool | None = None,
                     tie: str = "leftmost") -> jax.Array:
    """Masked find-seam over the column window [lo, lo+width):
    (H, W) f32 energy -> (H,) int32 seam (buffer coordinates).

    Bitwise-identical decisions to mask_energy + cumulative_energy + backtrack
    in ops/dp.py (with lo=0).  Uses the fused single-kernel path when the
    parents array fits VMEM; for larger images the folded forward (parents
    stream to HBM, no size cap) + windowed backtrack — gated on the folded
    lane dim (W // FOLD) staying 128-aligned (pltpu.roll on an unaligned
    folded lane dim is unvalidated on Mosaic); otherwise the streamed
    dp_forward + argmin + dp_backtrack path, which handles any W % 128 == 0.
    Composable with `jax.vmap` (batch lowers to one flattened kernel)."""
    H, W = E.shape
    if fused_seam_supported(H, W):
        return _find_seam_cv(interpret, tie)(
            E, jnp.asarray(width, jnp.int32), jnp.asarray(lo, jnp.int32)
        )
    if (W // FOLD) % LANE == 0:
        return _folded_find_seam(
            E, jnp.asarray(width, jnp.int32), jnp.asarray(lo, jnp.int32),
            interpret=interpret, tie=tie,
        )
    return _streamed_find_seam(
        E, jnp.asarray(width, jnp.int32), jnp.asarray(lo, jnp.int32),
        interpret=interpret, tie=tie,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "tie"))
def _streamed_find_seam(E: jax.Array, width: jax.Array, lo: jax.Array, *,
                        interpret: bool | None = None,
                        tie: str = "leftmost") -> jax.Array:
    """Fallback for big images whose folded lane dim is unaligned: streamed
    forward (parents to HBM) + tie-most argmin + streamed backtrack."""
    parents, mlast = dp_forward(E, width, lo, interpret=interpret, tie=tie)
    W = E.shape[1]
    col = jnp.arange(W)
    masked = jnp.where((col >= lo) & (col < lo + width), mlast[0], jnp.inf)
    from ..ops.dp import _argmin_tie

    j_last = _argmin_tie(masked, tie)
    return dp_backtrack(parents, j_last, interpret=interpret)
