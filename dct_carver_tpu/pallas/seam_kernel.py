"""Fused seam-apply kernel: compaction + edge fill + strip energy in one pass.

Per removed seam the XLA path pays three separate full passes (select-shift
compaction of luma/origcol/energy) plus an expensive general gather + scatter
for the strip energy update (~2.5 ms at 1080p — the dominant per-seam cost).
This kernel does all of it in one streamed pass over row blocks:

  * per-row compaction as a lane roll + select (VPU),
  * dead-region edge fill and left-pad maintenance,
  * the strip energy recomputation with per-row dynamic slices in VMEM
    (cheap — no XLA gather lowering), via the same separable-DCT math as
    `ops.dct.energy_from_bands`,
  * capture of the seam pixels' original columns for the visibility map.

Layout: buffers are column-padded — `lo = blocksize//2 - 1` left-pad columns
that always replicate logical column 0, and right padding up to a lane
multiple kept edge-filled — so every window/strip slice is interior and the
reference's border clamping (src/render.c:122-132) falls out of the padding
instead of per-element clamps.  `ops/fused.py` owns this layout and converts
from/to the standard CarveState views.

Reference analog: liblqr's seam removal + incremental energy update inside
`lqr_carver_resize` (/root/reference/src/render.c:377).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dp_kernel import ROW_BLOCK, _interpret_default
from ..ops.dct import _dct_matrix_np

__all__ = ["seam_apply", "strip_width", "pad_lo"]


def pad_lo(blocksize: int) -> int:
    """Left-pad columns replicating logical column 0 (window reach r-1)."""
    return max(blocksize // 2 - 1, 1)


def strip_width(blocksize: int) -> int:
    # matches ops.carve._strip_bounds: half = blocksize+1, width = 2*half+2
    return 2 * (blocksize + 1) + 2


def _rotl256(x, rem):
    """Rotate lanes of a (rows, 256) tile LEFT by a dynamic `rem` in [0, 256)
    using 8 static rolls + selects (dynamic pltpu.roll shifts compile in
    ~160 s each on Mosaic; static shifts are instant)."""
    for k in range(8):
        amt = 1 << k
        rolled = pltpu.roll(x, 256 - amt, axis=1)
        x = jnp.where(((rem >> k) & 1) != 0, rolled, x)
    return x


def _make_kernel(n: int, H: int, Wp: int, R: int):
    r = n // 2
    lo = pad_lo(n)
    sw = strip_width(n)
    gW = sw + n - 1
    # DMA row slices must be 8-row aligned; round the slab up and over-pad
    slab_rows = -(-(R + n - 1) // 8) * 8

    def kernel(iscal_ref, fscal_ref, d_ref, seam_slab_ref, seam_ctr_ref,
               luma_rp_ref, e_ref, orig_ref,
               luma_out, e_out, orig_out, origat_out,
               slab, sem):
        D = d_ref[:, :]
        b = pl.program_id(0)
        colids = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)
        width = iscal_ref[0]          # NEW logical width (after this seam)
        edges = fscal_ref[0]
        textures = fscal_ref[1]

        # ---- DMA the row-padded luma slab for this block -------------------
        dma = pltpu.make_async_copy(
            luma_rp_ref.at[pl.ds(b * R, slab_rows)], slab, sem
        )
        dma.start()
        dma.wait()

        def seam_at(q):  # seam of row-padded row b*R + q
            return iscal_ref[1 + b * R + q]

        # ---- compact ALL slab rows at once (block-wide VPU ops) ------------
        seam16 = seam_slab_ref[:, :]  # (slab_rows, 1) seams of the slab rows
        rows = slab[:, :]
        cmp = jnp.where(
            colids < seam16, rows, pltpu.roll(rows, Wp - 1, axis=1)
        )
        # dead region := logical edge value; left pad := logical col 0
        ev = jnp.sum(
            jnp.where(colids == lo + width - 1, cmp, 0.0), axis=1,
            keepdims=True,
        )
        lv = jnp.sum(
            jnp.where(colids == lo, cmp, 0.0), axis=1, keepdims=True
        )
        slab[:, :] = jnp.where(
            colids < lo, lv, jnp.where(colids < lo + width, cmp, ev)
        )

        # ---- block-wide compaction of E/orig + captures --------------------
        seamR = seam_ctr_ref[:, :]  # (R, 1) seams of the output rows
        orig_blk = orig_ref[:, :]
        origat_out[:, :] = jnp.sum(
            jnp.where(colids == seamR, orig_blk, 0), axis=1, keepdims=True
        )
        orig_out[:, :] = jnp.where(
            colids < seamR, orig_blk, pltpu.roll(orig_blk, Wp - 1, axis=1)
        )
        e_blk = e_ref[:, :]
        e_out[:, :] = jnp.where(
            colids < seamR, e_blk, pltpu.roll(e_blk, Wp - 1, axis=1)
        )
        luma_out[:, :] = slab[r - 1 : r - 1 + R, :]

        # ---- per output row: strip energy --------------------------------
        for rr in range(R):
            s_i = seam_at(rr + (r - 1))  # seam of output row b*R + rr

            # ---- strip energy (same math as ops.dct.energy_from_bands) ----
            # Mosaic can neither lane-slice at unaligned dynamic offsets nor
            # compile dynamic rolls in reasonable time (~160 s each!), so:
            # take a 128-aligned 256-lane dynamic slice, then rotate left by
            # the sub-block remainder with 8 static rolls + selects.
            start = jnp.clip(s_i - (n + 1), lo, Wp - sw - r)
            off = start - (r - 1)
            astart = jnp.minimum((off // 128) * 128, Wp - 256)
            astart = pl.multiple_of(astart, 128)
            rem = off - astart  # in [0, 256)
            wide = slab[rr : rr + n, pl.ds(astart, 256)]  # (n, 256)
            band = _rotl256(wide, rem)[:, :gW]
            V = jnp.dot(D, band, preferred_element_type=jnp.float32)

            # Mosaic cannot concat vector slices at mismatched offsets, so the
            # stage-2 sliding DCT is accumulated per (ky, kx) with the basis
            # entries read as SMEM scalars; ranks are compile-time constants.
            maxval = jnp.full((1, sw), -jnp.inf, jnp.float32)
            winner = jnp.full((1, sw), -1, jnp.int32)
            for ky in range(n):
                vrow = V[ky : ky + 1, :]
                # sh[dx][p] = V[ky, p+dx] via static right-rotations
                sh = [
                    (pltpu.roll(vrow, (gW - dx) % gW, axis=1)[:, :sw]
                     if dx else vrow[:, :sw])
                    for dx in range(n)
                ]
                kx0 = 1 if ky == 0 else 0  # DC excluded (src/dct.c:103)

                def kx_body(kx, mw):
                    mv, wn = mw
                    t = fscal_ref[2 + kx * n + 0] * sh[0]
                    for dx in range(1, n):
                        t = t + fscal_ref[2 + kx * n + dx] * sh[dx]
                    a = jnp.abs(t)  # (1, sw)
                    rank = kx * n + ky
                    take_new = a > mv
                    tie = a == mv
                    wn = jnp.where(
                        take_new, rank,
                        jnp.where(tie, jnp.maximum(wn, rank), wn),
                    )
                    mv = jnp.maximum(mv, a)
                    return (mv, wn)

                maxval, winner = jax.lax.fori_loop(
                    kx0, n, kx_body, (maxval, winner)
                )

            is_edge = (winner == 1) | (winner == n)
            wgt = jnp.where(is_edge, edges, textures)
            strip_e = maxval * wgt  # (1, sw)
            # read-modify-write the 256-lane aligned window containing the
            # strip (the shifted row is already in e_out; right-rotation =
            # left rotation by the complement)
            wstart = jnp.minimum((start // 128) * 128, Wp - 256)
            wstart = pl.multiple_of(wstart, 128)
            srem = start - wstart  # in [0, 256)
            strip256 = jnp.pad(strip_e, ((0, 0), (0, 256 - sw)))
            strip_at = _rotl256(strip256, (256 - srem) % 256)
            lane256 = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
            in_strip = (lane256 >= srem) & (lane256 < srem + sw)
            wide_e = e_out[rr : rr + 1, pl.ds(wstart, 256)]
            e_out[rr : rr + 1, pl.ds(wstart, 256)] = jnp.where(
                in_strip, strip_at, wide_e
            )

    return kernel, slab_rows


@functools.partial(
    jax.jit, static_argnames=("blocksize", "interpret")
)
def seam_apply(
    luma_p: jax.Array,    # (H, Wp) f32, column-padded layout
    energy_p: jax.Array,  # (H, Wp) f32
    origcol_p: jax.Array, # (H, Wp) i32
    seam_p: jax.Array,    # (H,) i32, buffer (padded) coordinates
    new_width: jax.Array, # () i32 — logical width AFTER this removal
    blocksize: int,
    edges,
    textures,
    *,
    interpret: bool | None = None,
):
    """Apply one seam removal; returns (luma_p', energy_p', origcol_p',
    orig_at_seam (H,) i32 — original columns of the removed pixels)."""
    H, Wp = luma_p.shape
    n = blocksize
    r = n // 2
    R = ROW_BLOCK
    if interpret is None:
        interpret = _interpret_default()
    kernel, slab_rows = _make_kernel(n, H, Wp, R)

    # row-padded luma (window rows clamp at the image border,
    # src/render.c:146-151) and matching row-padded seam array; the bottom
    # padding is sized so the last (8-row aligned) slab stays in bounds
    pad_bot = slab_rows - R - (r - 1)
    luma_rp = jnp.pad(luma_p, ((r - 1, pad_bot), (0, 0)), mode="edge")
    seam_rp = jnp.pad(seam_p.astype(jnp.int32), (r - 1, pad_bot), mode="edge")

    iscal = jnp.concatenate(
        [jnp.asarray(new_width, jnp.int32).reshape(1), seam_rp]
    )
    D = jnp.asarray(_dct_matrix_np(n), jnp.float32)
    fscal = jnp.concatenate([
        jnp.stack([
            jnp.asarray(edges, jnp.float32),
            jnp.asarray(textures, jnp.float32),
        ]),
        D.reshape(-1),  # D[kx*n + dx] scalars for the stage-2 accumulation
    ])

    nb = H // R
    slab_rows = -(-(R + n - 1) // 8) * 8
    # per-block slab-row seam windows materialized (blocks overlap by n-1
    # rows, which BlockSpecs cannot express)
    slab_idx = (
        jnp.arange(nb, dtype=jnp.int32)[:, None] * R
        + jnp.arange(slab_rows, dtype=jnp.int32)[None, :]
    )
    seam_slab = seam_rp[slab_idx].reshape(nb * slab_rows, 1)
    seam_ctr = seam_p.astype(jnp.int32).reshape(H, 1)

    grid = (nb,)
    blk = lambda b: (b, 0)
    full = lambda b: (0, 0)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n, n), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((slab_rows, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((R, Wp), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Wp), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, Wp), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Wp), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Wp), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), blk, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, Wp), jnp.float32),
            jax.ShapeDtypeStruct((H, Wp), jnp.float32),
            jax.ShapeDtypeStruct((H, Wp), jnp.int32),
            jax.ShapeDtypeStruct((H, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((slab_rows, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(iscal, fscal, D, seam_slab, seam_ctr, luma_rp, energy_p, origcol_p)
    luma_out, e_out, orig_out, origat = out
    return luma_out, e_out, orig_out, origat[:, 0]
