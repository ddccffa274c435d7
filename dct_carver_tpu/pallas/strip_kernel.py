"""Pallas kernels for the per-seam strip energy update.

Three pieces replace the XLA data movement AND (on hardware) the chain math
around the strip recompute:

  * slab gather   — vmap(dynamic_slice) at per-block dynamic column offsets
                    lowers to a general gather (~0.15 ms/seam at 1080p);
                    replaced by a 128-aligned 256-lane window DMA plus an
                    in-register lane rotation (static rolls + selects —
                    dynamic `pltpu.roll` shifts are pathologically slow to
                    compile on Mosaic);
  * strip energy  — the stage-1/stage-2 DCT-argmax chains run fused in VMEM
                    on the gathered slabs (`strip_energy_pallas`), sharing
                    energy_kernel's `_energy_chain_ops` emitter so values
                    are bitwise-identical to the full-map kernel AND to the
                    XLA chains on TPU (the 255-atom n=16 argmax never
                    round-trips HBM);
  * strip scatter — vmap(dynamic_update_slice) lowers to a general scatter
                    (~0.37 ms/seam); replaced by a double-buffered RMW of
                    only the 8x256 windows (energy aliased in place,
                    ~1 MB/seam instead of a full-image scatter).

The strip update therefore remains bitwise identical to a full recompute
(tests/test_carve.py; hardware chain parity in scripts/verify_strip_tpu.py).

Reference analog: liblqr's incremental energy update after a seam removal
inside `lqr_carver_resize` (/root/reference/src/render.c:377).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dp_kernel import _interpret_default
from .spatial_dp_kernel import _out_struct

__all__ = ["gather_slabs", "scatter_strips", "strip_pallas_supported",
           "strip_energy_pallas"]

LANE = 128
WIN = 256          # aligned lane window (2 lane groups)
ROW_BLOCK = 8      # must match ops.carve.STRIP_ROW_BLOCK


def strip_pallas_supported(H: int, W: int, row_block: int = ROW_BLOCK) -> bool:
    """Shapes on which the Pallas gather/scatter strip path applies."""
    return H % row_block == 0 and W % LANE == 0 and W >= WIN


def _rotl(x, rem):
    """Rotate lanes of (rows, WIN) LEFT by dynamic rem in [0, WIN) using
    8 static rolls + selects."""
    k, amt = 0, 1
    while amt < WIN:
        rolled = pltpu.roll(x, WIN - amt, axis=1)
        x = jnp.where(((rem >> k) & 1) != 0, rolled, x)
        k += 1
        amt <<= 1
    return x


# ------------------------------------------------------------------ gather --

def _make_gather_kernel(slab_rows: int, row_block: int,
                        blocks_per_image: int, stride: int):
    def kernel(bs_ref, lp_ref, out_ref, slab, sem):
        """Per block b: DMA the (slab_rows, WIN) window of the padded luma at
        the 128-aligned lane offset astart, rotate left so lane t holds
        padded column bs+t, and emit it.  Batch-aware: grid step g belongs to
        image g // blocks_per_image, whose padded rows start at image*stride
        in the row-flattened lp (flattened form for `jax.vmap`, custom_vmap).

        Double-buffered: block b+1's window DMA is started before waiting on
        block b's, so the per-block DMA latency is hidden behind the previous
        block's rotate+store instead of serializing the grid (~0.7 us/block
        -> ~0.2 us/block at 1080p)."""
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        Wl = lp_ref.shape[1]

        def dma(i, slot):
            bsi = bs_ref[i]
            astart = jnp.minimum((bsi // LANE) * LANE, Wl - WIN)
            astart = pl.multiple_of(astart, LANE)
            row = (i // blocks_per_image) * stride \
                + (i % blocks_per_image) * row_block
            return pltpu.make_async_copy(
                lp_ref.at[pl.ds(row, slab_rows), pl.ds(astart, WIN)],
                slab.at[slot], sem.at[slot],
            )

        slot = jax.lax.rem(b, 2)

        @pl.when(b == 0)
        def _():
            dma(0, 0).start()

        @pl.when(b + 1 < nb)
        def _():
            dma(b + 1, jax.lax.rem(b + 1, 2)).start()

        dma(b, slot).wait()

        bs = bs_ref[b]
        astart = jnp.minimum((bs // LANE) * LANE, Wl - WIN)
        out_ref[:, :] = _rotl(slab[slot], bs - astart)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("slab_rows", "row_block", "interpret"))
def _gather_slabs_batched(lp: jax.Array, bs: jax.Array, slab_rows: int, *,
                          row_block: int = ROW_BLOCK,
                          interpret: bool | None = None) -> jax.Array:
    """Flattened batch form: lp (B, Hp, Wl), bs (B, nb) ->
    (B, nb, slab_rows, WIN).  One kernel launch over B*nb grid steps."""
    B, Hp, Wl = lp.shape
    nb = int(bs.shape[1])
    out = _gather_slabs_call(
        lp.reshape(B * Hp, Wl), bs.astype(jnp.int32).reshape(B * nb),
        slab_rows, row_block, nb, Hp, interpret)
    return out.reshape(B, nb, slab_rows, WIN)


def _gather_slabs_call(lp2, bs1, slab_rows, row_block, blocks_per_image,
                       stride, interpret=None):
    """Raw (un-jitted) kernel invocation — also usable inside shard_map
    (propagates the varying-axes type onto the output)."""
    if interpret is None:
        interpret = _interpret_default()
    n_blocks = bs1.shape[0]
    return pl.pallas_call(
        _make_gather_kernel(slab_rows, row_block, blocks_per_image, stride),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((slab_rows, WIN), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((n_blocks * slab_rows, WIN), jnp.float32, lp2),
        scratch_shapes=[
            pltpu.VMEM((2, slab_rows, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(bs1, lp2)


@functools.lru_cache(maxsize=None)
def _gather_cv(slab_rows: int, row_block: int, interpret: bool | None):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(lp, bs):
        return _gather_slabs_batched(
            lp[None], bs[None], slab_rows, row_block=row_block,
            interpret=interpret,
        )[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, lp, bs):
        lp_b, bs_b = in_batched
        if not lp_b:
            lp = jnp.broadcast_to(lp[None], (axis_size, *lp.shape))
        if not bs_b:
            bs = jnp.broadcast_to(bs[None], (axis_size, *bs.shape))
        return _gather_slabs_batched(
            lp, bs, slab_rows, row_block=row_block, interpret=interpret
        ), True

    return f


def gather_slabs(lp: jax.Array, bs: jax.Array, slab_rows: int, *,
                 row_block: int = ROW_BLOCK,
                 interpret: bool | None = None) -> jax.Array:
    """lp (Hp, Wl) f32 row/col-padded luma (Wl % 128 == 0, Wl >= 256, rows
    padded so every [b*8, b*8+slab_rows) slice is in bounds), bs (nb,) i32
    per-block window starts in lp columns (each in [0, Wl - WIN]) ->
    (nb, slab_rows, WIN) f32 with lane t = lp[row, bs[b]+t].

    Only lanes [0, WIN - rem) are valid (rem = bs - aligned window start; the
    in-register rotation wraps the tail).  rem < 128 when the aligned window
    fits, and rem <= WIN - gwb when clamped at the right edge provided
    Wl >= W + blocksize - 1 — so callers reading the first gwb <= 128 lanes
    always see valid data.  slab_rows must be a multiple of 8 (DMA row
    alignment).  Composable with `jax.vmap` (flattened batched kernel).
    """
    return _gather_cv(slab_rows, row_block, interpret)(lp, bs)


# ----------------------------------------------------------------- scatter --

def _make_scatter_kernel(swb: int, R: int):
    def kernel(bs_ref, strip_ref, e_in, e_out, win, sem_in, sem_out):
        """Per block b: read-modify-write the 256-lane aligned window of the
        block's 8 energy rows in place (e_in aliased to e_out), placing strip
        lanes [0, swb) at columns [bs, bs+swb).

        Double-buffered RMW: window b+1 is prefetched while b is modified,
        and b's write-back completes while b+1 is processed.  Step order is
        wait-out(b-1) -> prefetch-in(b+1) -> wait-in(b) -> modify ->
        start-out(b); blocks touch disjoint rows, so in/out DMAs never
        overlap the same window."""
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        W = e_out.shape[1]

        def win_dma(i, slot, outgoing):
            bsi = bs_ref[i]
            # signed starts supported: blocks whose strip lies (partly)
            # outside [0, W) clamp their WINDOW into range and mask the
            # out-of-range lanes below
            wstart = jnp.clip((bsi // LANE) * LANE, 0, W - WIN)
            wstart = pl.multiple_of(wstart, LANE)
            ew = e_out.at[pl.ds(i * R, R), pl.ds(wstart, WIN)]
            if outgoing:
                return pltpu.make_async_copy(win.at[slot], ew, sem_out.at[slot])
            return pltpu.make_async_copy(ew, win.at[slot], sem_in.at[slot])

        slot = jax.lax.rem(b, 2)

        @pl.when(b == 0)
        def _():
            win_dma(0, 0, False).start()

        # reclaim the other slot before prefetching into it
        @pl.when(b >= 1)
        def _():
            win_dma(b - 1, jax.lax.rem(b - 1, 2), True).wait()

        @pl.when(b + 1 < nb)
        def _():
            win_dma(b + 1, jax.lax.rem(b + 1, 2), False).start()

        win_dma(b, slot, False).wait()

        bs = bs_ref[b]
        wstart = jnp.clip((bs // LANE) * LANE, 0, W - WIN)
        srem = bs - wstart  # signed: negative / >= WIN when bs is outside

        # strip lanes [0, swb) -> window lanes [srem, srem+swb); the signed
        # mask silently drops lanes outside the window (cross-boundary
        # blocks write only their in-range overlap)
        rot = _rotl(strip_ref[:, :], jnp.mod(WIN - srem, WIN))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
        in_strip = (lane >= srem) & (lane < srem + swb)
        win[slot] = jnp.where(in_strip, rot, win[slot])

        win_dma(b, slot, True).start()

        @pl.when(b == nb - 1)
        def _():
            win_dma(b, slot, True).wait()

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("swb", "row_block", "interpret"))
def _scatter_strips_batched(E: jax.Array, strips: jax.Array, bs: jax.Array,
                            swb: int, *, row_block: int = ROW_BLOCK,
                            interpret: bool | None = None) -> jax.Array:
    """Flattened batch form: E (B, H, W), strips (B, nb, row_block, WIN),
    bs (B, nb).  The kernel is batch-transparent: with H % row_block == 0,
    flat grid step g's rows start at g*row_block in the row-flattened E, so
    blocks never straddle images."""
    B, H, W = E.shape
    nb = int(bs.shape[1])
    out = _scatter_strips_call(
        E.reshape(B * H, W), strips.reshape(B * nb * row_block, WIN),
        bs.astype(jnp.int32).reshape(B * nb), swb, row_block, interpret)
    return out.reshape(B, H, W)


def _scatter_strips_call(E2, strips2, bs1, swb, row_block, interpret=None):
    """Raw (un-jitted) kernel invocation — also usable inside shard_map."""
    if interpret is None:
        interpret = _interpret_default()
    n_blocks = bs1.shape[0]
    return pl.pallas_call(
        _make_scatter_kernel(swb, row_block),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((row_block, WIN), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=_out_struct(E2.shape, jnp.float32, E2),
        input_output_aliases={2: 0},
        scratch_shapes=[
            pltpu.VMEM((2, row_block, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(bs1, strips2, E2)


@functools.lru_cache(maxsize=None)
def _scatter_cv(swb: int, row_block: int, interpret: bool | None):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(E, strips, bs):
        return _scatter_strips_batched(
            E[None], strips[None], bs[None], swb, row_block=row_block,
            interpret=interpret,
        )[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, E, strips, bs):
        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size, *x.shape))

        E, strips, bs = (bcast(x, b) for x, b in
                         zip((E, strips, bs), in_batched))
        return _scatter_strips_batched(
            E, strips, bs, swb, row_block=row_block, interpret=interpret
        ), True

    return f


def scatter_strips(E: jax.Array, strips: jax.Array, bs: jax.Array, swb: int,
                   *, row_block: int = ROW_BLOCK,
                   interpret: bool | None = None) -> jax.Array:
    """E (H, W) f32, strips (nb, row_block, WIN) f32 (values in lanes
    [0, swb), rest ignored), bs (nb,) i32 (each in [0, W - swb]) -> E with
    E[b*R:(b+1)*R, bs[b]:bs[b]+swb] = strips[b, :, :swb].

    The energy buffer is aliased in place; only the (row_block)x256 windows
    move.  H % row_block == 0, W % 128 == 0, W >= 256 required.
    Composable with `jax.vmap` (flattened batched kernel).
    """
    return _scatter_cv(swb, row_block, interpret)(E, strips, bs)


# ------------------------------------------------------------ strip energy --

def _make_strip_energy_kernel(n: int, R: int, cwin: int = LANE):
    import numpy as np
    from .energy_kernel import _energy_chain_ops
    from ..ops.dct import _dct_matrix_np

    D = np.asarray(_dct_matrix_np(n), np.float32)

    def kernel(fscal_ref, slab_ref, out_ref):
        # compute on the first `cwin` lanes only: every tap of every valid
        # output lane (t < swb, taps < gwb <= 128) lives there — half the
        # chain work of the full 256-lane window
        out_ref[:, :] = _energy_chain_ops(
            D, n, R, cwin, lambda dy: slab_ref[dy : dy + R, :cwin],
            fscal_ref[0], fscal_ref[1],
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("n", "R", "interpret"))
def _strip_energy_batched(slabs, n, edges, textures, R,
                          interpret: bool | None = None):
    """slabs (B, nb, slab_rows, WIN) f32 -> (B, nb, R, WIN) f32 energy.

    Runs the SAME fused stage-1/stage-2 chains as the full-map kernel
    (energy_kernel._energy_chain_ops) directly on the gathered slabs, so the
    per-atom responses never round-trip HBM and the 255-atom (n=16) argmax
    stays in VMEM.  Output lanes >= swb (and any lanes whose taps reach the
    rotated slab tail) are garbage — the scatter's lane mask discards them,
    exactly like the XLA bands path discarded columns beyond swb."""
    B, nb, slab_rows, _ = slabs.shape
    out = _strip_energy_call(
        slabs.reshape(B * nb * slab_rows, WIN), n, edges, textures, R,
        slab_rows, interpret)
    out = jnp.pad(out, ((0, 0), (0, WIN - LANE)))
    return out.reshape(B, nb, R, WIN)


def _strip_energy_call(slabs2, n, edges, textures, R, slab_rows,
                       interpret=None, cwin=LANE):
    """Raw (un-jitted) kernel invocation — also usable inside shard_map.
    Output is (n_blocks * R, cwin); valid lanes [0, swb) require
    gwb <= cwin."""
    if interpret is None:
        interpret = _interpret_default()
    n_blocks = slabs2.shape[0] // slab_rows
    fscal = jnp.stack([
        jnp.asarray(edges, jnp.float32),
        jnp.asarray(textures, jnp.float32),
    ])
    return pl.pallas_call(
        _make_strip_energy_kernel(n, R, cwin),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((slab_rows, WIN), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, cwin), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((n_blocks * R, cwin), jnp.float32, slabs2),
        interpret=interpret,
    )(fscal, slabs2)


@functools.lru_cache(maxsize=None)
def _strip_energy_cv(n: int, R: int, interpret: bool | None):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(slabs, edges, textures):
        return _strip_energy_batched(
            slabs[None], n, edges, textures, R, interpret=interpret
        )[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, slabs, edges, textures):
        s_b, e_b, t_b = in_batched
        if not s_b:
            slabs = jnp.broadcast_to(slabs[None], (axis_size, *slabs.shape))
        if e_b or t_b:
            out = jax.lax.map(
                lambda a: f(a[0], a[1], a[2]),
                (slabs,
                 jnp.broadcast_to(jnp.asarray(edges), (axis_size,))
                 if not e_b else edges,
                 jnp.broadcast_to(jnp.asarray(textures), (axis_size,))
                 if not t_b else textures),
            )
        else:
            out = _strip_energy_batched(
                slabs, n, edges, textures, R, interpret=interpret
            )
        return out, True

    return f


def strip_energy_pallas(slabs, n: int, edges, textures, R: int,
                        interpret: bool | None = None):
    """(nb, slab_rows, WIN) gathered slabs -> (nb, R, WIN) weighted max-AC
    energy (lanes [0, swb) valid), bitwise-identical on TPU to the XLA
    `energy_from_bands` chains on the same slab values (shared op emitter
    with the full-map kernel).  Composable with `jax.vmap` (flattened
    batched kernel)."""
    return _strip_energy_cv(n, R, interpret)(
        slabs, jnp.asarray(edges, jnp.float32),
        jnp.asarray(textures, jnp.float32),
    )


# ------------------------------------------------- paired (packed) strip ----
#
# When the tap window gwb fits 64 lanes, TWO blocks pack into one 128-lane
# energy row: slot 0 in lanes [0, 64), slot 1 in lanes [64, 128).  The chain
# kernel is unchanged — its lane rolls wrap into the other slot only beyond
# each slot's swb valid outputs, exactly like the unpacked tail garbage —
# and runs on HALF the rows.  The strip energy is chain-compute-bound at
# batch scale (the VPU computes all 128 lanes regardless of swb), so packing
# halves its cost.  Values stay bitwise identical: the same tap values reach
# the same chains, just in different lanes (asserted vs the unpacked path in
# tests/test_strip_kernel.py).

SLOT = 64


def packed_strip_row_block(H: int, blocksize: int,
                           delta_x: int = 1) -> int | None:
    """Largest row block whose tap window fits one 64-lane slot (None if
    even R=8 does not fit — e.g. blocksize 16 with delta_x >= 2)."""
    from ..ops.carve import _strip_block_dims

    for R in (32, 24, 16, 8):
        if H % R == 0 and _strip_block_dims(blocksize, delta_x, R)[1] <= SLOT:
            return R
    return None


PAIR_GROUP = 8


def _group_of(n_pairs: int) -> int:
    """Pairs per grid step: the strip kernels are per-grid-step-overhead
    bound, so fatter steps win — capped at the largest power of two not
    exceeding the REAL pair count, so tail padding never more than doubles
    the work (padding a 2-pair call to 8 quadruples the unrolled interpret
    program and can crash the XLA:CPU compiler on big suites)."""
    G = 1
    while G * 2 <= min(PAIR_GROUP, n_pairs):
        G *= 2
    return G


def _padded_pairs(n_blocks: int) -> int:
    """Pairs per call after padding the block list to a multiple of the
    group size; dummy tail blocks clamp to the last real block (their
    writes duplicate identical bytes — benign)."""
    n_pairs = -(-n_blocks // 2)
    G = _group_of(n_pairs)
    return -(-n_pairs // G) * G


def _make_gather2_kernel(slab_rows: int, row_block: int,
                         blocks_per_image: int, stride: int, n_blocks: int,
                         G: int):
    def kernel(bs_ref, lp_ref, out_ref, slab, sem):
        """Grid step g gathers pairs [gG, gG+G): one window DMA per block
        (2G in flight, double-buffered across steps) and merges each pair's
        rotated first 64 lanes into one (slab_rows, 128) output row.  An
        odd tail repeats the last block; its slot-1 copy is never read back
        (the scatter grid runs over blocks, not pairs)."""
        g = pl.program_id(0)
        ng = pl.num_programs(0)
        Wl = lp_ref.shape[1]
        B2 = 2 * G

        def dma(i, slot):
            i = jnp.minimum(i, n_blocks - 1)
            bsi = bs_ref[i]
            astart = jnp.minimum((bsi // LANE) * LANE, Wl - WIN)
            astart = pl.multiple_of(astart, LANE)
            row = (i // blocks_per_image) * stride \
                + (i % blocks_per_image) * row_block
            return pltpu.make_async_copy(
                lp_ref.at[pl.ds(row, slab_rows), pl.ds(astart, WIN)],
                slab.at[slot], sem.at[slot],
            )

        @pl.when(g == 0)
        def _():
            for k in range(B2):
                dma(k, k).start()

        @pl.when(g + 1 < ng)
        def _():
            nph = B2 * jax.lax.rem(g + 1, 2)
            for k in range(B2):
                dma((g + 1) * B2 + k, nph + k).start()

        def rem_of(i):
            i = jnp.minimum(i, n_blocks - 1)
            bsi = bs_ref[i]
            astart = jnp.minimum((bsi // LANE) * LANE, Wl - WIN)
            return bsi - astart

        ph = B2 * jax.lax.rem(g, 2)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        rows = []
        for k in range(G):
            i0 = g * B2 + 2 * k
            dma(i0, ph + 2 * k).wait()
            dma(i0 + 1, ph + 2 * k + 1).wait()
            a = _rotl(slab[ph + 2 * k], rem_of(i0))[:, :LANE]
            b = _rotl(slab[ph + 2 * k + 1], rem_of(i0 + 1))[:, :LANE]
            rows.append(jnp.where(lane < SLOT, a,
                                  pltpu.roll(b, SLOT, axis=1)))
        out_ref[:, :] = jnp.concatenate(rows, axis=0)

    return kernel


def _gather2_slabs_call(lp2, bs1, slab_rows, row_block, blocks_per_image,
                        stride, interpret=None):
    """Paired gather: (n_pairs * slab_rows, LANE) packed slabs (n_pairs
    padded to a PAIR_GROUP multiple; dummy tail slabs duplicate the last
    real block and are never consumed)."""
    if interpret is None:
        interpret = _interpret_default()
    n_blocks = bs1.shape[0]
    n_pairs = _padded_pairs(n_blocks)
    G = _group_of(-(-n_blocks // 2))
    bs1 = jnp.pad(bs1, (0, 2 * n_pairs - n_blocks), mode="edge")
    return pl.pallas_call(
        _make_gather2_kernel(slab_rows, row_block, blocks_per_image, stride,
                             n_blocks, G),
        grid=(n_pairs // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((G * slab_rows, LANE), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((n_pairs * slab_rows, LANE), jnp.float32, lp2),
        scratch_shapes=[
            pltpu.VMEM((4 * G, slab_rows, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((4 * G,)),
        ],
        interpret=interpret,
    )(bs1, lp2)


def _make_scatter2_kernel(swb: int, R: int, n_blocks: int, G: int):
    def kernel(bs_ref, strip_ref, e_in, e_out, win, sem_in, sem_out):
        """Grid step g read-modify-writes the 2G windows of blocks
        [2gG, 2gG+2G); block b's strip lanes live in slot b%2 of the packed
        (R, 128) strip row b//2.  Step order: wait step g-1's write-backs ->
        prefetch step g+1's reads -> per block: wait read, modify, start
        write-back.  Blocks touch disjoint rows, so DMAs never overlap."""
        g = pl.program_id(0)
        ng = pl.num_programs(0)
        W = e_out.shape[1]
        B2 = 2 * G

        def win_dma(i, slot, outgoing):
            # an odd tail's dummy index clamps to the last real block: its
            # RMW re-writes that block's window with the identical values
            # (the gather duplicated the same slab into the dummy slot)
            i = jnp.minimum(i, n_blocks - 1)
            bsi = bs_ref[i]
            wstart = jnp.clip((bsi // LANE) * LANE, 0, W - WIN)
            wstart = pl.multiple_of(wstart, LANE)
            ew = e_out.at[pl.ds(i * R, R), pl.ds(wstart, WIN)]
            if outgoing:
                return pltpu.make_async_copy(win.at[slot], ew,
                                             sem_out.at[slot])
            return pltpu.make_async_copy(ew, win.at[slot], sem_in.at[slot])

        @pl.when(g == 0)
        def _():
            for k in range(B2):
                win_dma(k, k, False).start()

        @pl.when(g >= 1)
        def _():
            pph = B2 * jax.lax.rem(g - 1, 2)
            for k in range(B2):
                win_dma((g - 1) * B2 + k, pph + k, True).wait()

        @pl.when(g + 1 < ng)
        def _():
            nph = B2 * jax.lax.rem(g + 1, 2)
            for k in range(B2):
                win_dma((g + 1) * B2 + k, nph + k, False).start()

        ph = B2 * jax.lax.rem(g, 2)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
        for k in range(B2):
            b = g * B2 + k
            win_dma(b, ph + k, False).wait()
            bs = bs_ref[jnp.minimum(b, n_blocks - 1)]
            wstart = jnp.clip((bs // LANE) * LANE, 0, W - WIN)
            srem = bs - wstart
            s128 = strip_ref[pl.ds((k // 2) * R, R), :]  # (R, 128) pair row
            if k % 2 == 1:
                s128 = pltpu.roll(s128, LANE - SLOT, axis=1)
            wide = jnp.concatenate(
                [s128, jnp.zeros((R, WIN - LANE), jnp.float32)], axis=1)
            rot = _rotl(wide, jnp.mod(WIN - srem, WIN))
            in_strip = (lane >= srem) & (lane < srem + swb)
            win[ph + k] = jnp.where(in_strip, rot, win[ph + k])
            win_dma(b, ph + k, True).start()

        @pl.when(g == ng - 1)
        def _():
            for k in range(B2):
                win_dma(g * B2 + k, ph + k, True).wait()

    return kernel


def _scatter2_strips_call(E2, strips2, bs1, swb, row_block, interpret=None):
    """Paired scatter: strips2 (n_pairs * row_block, LANE) packed strips.
    Requires an even block count (callers pad bs/strips by one dummy block
    whose window writes duplicate the last real block's values)."""
    if interpret is None:
        interpret = _interpret_default()
    n_blocks = bs1.shape[0]
    n_pairs = _padded_pairs(n_blocks)
    G = _group_of(-(-n_blocks // 2))
    bs1 = jnp.pad(bs1, (0, 2 * n_pairs - n_blocks), mode="edge")
    return pl.pallas_call(
        _make_scatter2_kernel(swb, row_block, n_blocks, G),
        grid=(n_pairs // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((G * row_block, LANE), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=_out_struct(E2.shape, jnp.float32, E2),
        input_output_aliases={2: 0},
        scratch_shapes=[
            pltpu.VMEM((4 * G, row_block, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((4 * G,)),
            pltpu.SemaphoreType.DMA((4 * G,)),
        ],
        interpret=interpret,
    )(bs1, strips2, E2)


def _strip_energy2_call(slabs2, n, edges, textures, R, slab_rows,
                        interpret=None):
    """Chain energy on PACKED (n_pairs * slab_rows, LANE) slabs ->
    (n_pairs * R, LANE); valid lanes [0, swb) and [SLOT, SLOT + swb)."""
    if interpret is None:
        interpret = _interpret_default()
    n_pairs = slabs2.shape[0] // slab_rows   # already group-padded
    G = _group_of(n_pairs)
    assert n_pairs % G == 0, (n_pairs, G)  # guaranteed by _padded_pairs
    fscal = jnp.stack([
        jnp.asarray(edges, jnp.float32),
        jnp.asarray(textures, jnp.float32),
    ])
    return pl.pallas_call(
        _make_strip_energy2_kernel(n, R, slab_rows, G),
        grid=(n_pairs // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((G * slab_rows, LANE), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G * R, LANE), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((n_pairs * R, LANE), jnp.float32, slabs2),
        interpret=interpret,
    )(fscal, slabs2)


def _make_strip_energy2_kernel(n: int, R: int, slab_rows: int, G: int):
    import numpy as np
    from .energy_kernel import _energy_chain_ops
    from ..ops.dct import _dct_matrix_np

    D = np.asarray(_dct_matrix_np(n), np.float32)

    def kernel(fscal_ref, slab_ref, out_ref):
        for k in range(G):   # static sub-blocks per grid step
            base = k * slab_rows
            out_ref[pl.ds(k * R, R), :] = _energy_chain_ops(
                D, n, R, LANE,
                lambda dy: slab_ref[pl.ds(base + dy, R), :],
                fscal_ref[0], fscal_ref[1],
            )

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n", "swb", "slab_rows", "row_block",
                                    "interpret"))
def _strip_packed_batched(lp, E_shift, bs, n, edges, textures, swb,
                          slab_rows, row_block, interpret=None):
    """Flattened batch form of the packed strip pipeline: lp (B, Hp, Wl),
    E_shift (B, H, W), bs (B, nb) -> updated energy (B, H, W).

    On TPU the chains run in the packed Pallas kernel (bitwise equal to the
    unpacked kernel and the XLA chains); interpreted backends keep the XLA
    `energy_from_bands` on slot-extracted windows, so the packed path stays
    CPU-testable bitwise against the unpacked one."""
    from ..ops.carve import _bands_energy

    B, Hp, Wl = lp.shape
    _, H, W = E_shift.shape
    nb = int(bs.shape[1])
    R = row_block
    gwb = swb + n - 1
    if interpret is None:
        interpret = _interpret_default()
    flat_bs = bs.astype(jnp.int32).reshape(B * nb)
    slabs = _gather2_slabs_call(lp.reshape(B * Hp, Wl), flat_bs, slab_rows,
                                R, nb, Hp, interpret)
    n_pairs = slabs.shape[0] // slab_rows
    if not interpret:
        strips = _strip_energy2_call(slabs, n, edges, textures, R,
                                     slab_rows, interpret)
    else:
        # slot-extract and run the XLA chains (bitwise == unpacked CPU path)
        sl = slabs.reshape(n_pairs, slab_rows, LANE)
        wins = jnp.concatenate([sl[:, :, :gwb], sl[:, :, SLOT:SLOT + gwb]],
                               axis=0)              # (2*n_pairs, rows, gwb)
        bands = jnp.stack([wins[:, rr:rr + n, :] for rr in range(R)], axis=1)
        e = _bands_energy(bands.reshape(2 * n_pairs * R, n, gwb), n, edges,
                          textures, None).astype(jnp.float32)
        e = e.reshape(2, n_pairs, R, swb)
        strips = jnp.concatenate(
            [jnp.pad(e[0], ((0, 0), (0, 0), (0, SLOT - swb))),
             jnp.pad(e[1], ((0, 0), (0, 0), (0, SLOT - swb)))], axis=2
        ).reshape(n_pairs * R, LANE)
    out = _scatter2_strips_call(E_shift.reshape(B * H, W), strips, flat_bs,
                                swb, R, interpret)
    return out.reshape(B, H, W)


@functools.lru_cache(maxsize=None)
def _strip_packed_cv(n: int, swb: int, slab_rows: int, row_block: int,
                     interpret: bool | None):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(lp, E_shift, bs, edges, textures):
        return _strip_packed_batched(
            lp[None], E_shift[None], bs[None], n, edges, textures, swb,
            slab_rows, row_block, interpret)[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, lp, E_shift, bs, edges, textures):
        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size, *x.shape))

        lp, E_shift, bs = (bcast(x, b) for x, b in
                           zip((lp, E_shift, bs), in_batched[:3]))
        if in_batched[3] or in_batched[4]:
            out = jax.lax.map(
                lambda a: f(*a),
                (lp, E_shift, bs,
                 jnp.broadcast_to(jnp.asarray(edges), (axis_size,)),
                 jnp.broadcast_to(jnp.asarray(textures), (axis_size,))))
        else:
            out = _strip_packed_batched(lp, E_shift, bs, n, edges, textures,
                                        swb, slab_rows, row_block, interpret)
        return out, True

    return f


def strip_update_packed(lp, E_shift, bs, n: int, edges, textures, swb: int,
                        slab_rows: int, row_block: int,
                        interpret: bool | None = None):
    """Packed-pair strip pipeline (gather2 -> chains -> scatter2), values
    bitwise identical to the unpacked gather/energy/scatter composition.
    Composable with `jax.vmap` (flattened batched kernels)."""
    return _strip_packed_cv(n, swb, slab_rows, row_block, interpret)(
        lp, E_shift, bs.astype(jnp.int32),
        jnp.asarray(edges, jnp.float32), jnp.asarray(textures, jnp.float32))
