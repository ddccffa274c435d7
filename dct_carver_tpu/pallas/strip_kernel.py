"""Pallas gather/scatter for the per-seam strip energy update.

The strip update's MATH (energy_from_bands) is cheap and must stay in XLA —
its explicit multiply-add chains are the bit-exactness contract
(ops/dct.py:75-116).  What is slow in XLA is the DATA MOVEMENT around it:

  * slab gather   — vmap(dynamic_slice) at per-block dynamic column offsets
                    lowers to a general gather (~0.15 ms/seam at 1080p);
  * strip scatter — vmap(dynamic_update_slice) lowers to a general scatter
                    (~0.37 ms/seam — the single biggest cost of the apply
                    stage).

Both are replaced here by tiny Pallas kernels built on one primitive: a
128-aligned 256-lane window DMA plus an in-register lane rotation done with
static rolls + selects (dynamic `pltpu.roll` shifts are pathologically slow
to compile on Mosaic).  The scatter aliases its energy input to the output
and read-modify-writes ONLY the 8x256 windows (~1 MB/seam instead of a
full-image scatter).

Values are plain copies / selects of XLA-computed numbers, so the strip
update remains bitwise identical to a full recompute (tests/test_carve.py).

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

__all__ = ["gather_slabs", "scatter_strips", "strip_pallas_supported"]

LANE = 128
WIN = 256          # aligned lane window (2 lane groups)
ROW_BLOCK = 8      # must match ops.carve.STRIP_ROW_BLOCK


def strip_pallas_supported(H: int, W: int) -> bool:
    """Shapes on which the Pallas gather/scatter strip path applies."""
    return H % ROW_BLOCK == 0 and W % LANE == 0 and W >= WIN


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

def _make_gather_kernel(slab_rows: int):
    def kernel(bs_ref, lp_ref, out_ref, slab, sem):
        """Per block b: DMA the (slab_rows, WIN) window of the padded luma at
        the 128-aligned lane offset astart, rotate left so lane t holds
        padded column bs+t, and emit it."""
        b = pl.program_id(0)
        Wl = lp_ref.shape[1]
        bs = bs_ref[b]
        astart = jnp.minimum((bs // LANE) * LANE, Wl - WIN)
        astart = pl.multiple_of(astart, LANE)

        dma = pltpu.make_async_copy(
            lp_ref.at[pl.ds(b * ROW_BLOCK, slab_rows), pl.ds(astart, WIN)],
            slab, sem,
        )
        dma.start()
        dma.wait()

        out_ref[:, :] = _rotl(slab[:, :], bs - astart)

    return kernel


@functools.partial(jax.jit, static_argnames=("slab_rows", "interpret"))
def gather_slabs(lp: jax.Array, bs: jax.Array, slab_rows: int, *,
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
    alignment).
    """
    nb = int(bs.shape[0])
    if interpret is None:
        interpret = _interpret_default()
    out = pl.pallas_call(
        _make_gather_kernel(slab_rows),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((slab_rows, WIN), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * slab_rows, WIN), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(bs.astype(jnp.int32), lp)
    return out.reshape(nb, slab_rows, WIN)


# ----------------------------------------------------------------- scatter --

def _make_scatter_kernel(swb: int):
    def kernel(bs_ref, strip_ref, e_in, e_out, win, sem_in, sem_out):
        """Per block b: read-modify-write the 256-lane aligned window of the
        block's 8 energy rows in place (e_in aliased to e_out), placing strip
        lanes [0, swb) at columns [bs, bs+swb)."""
        b = pl.program_id(0)
        W = e_out.shape[1]
        bs = bs_ref[b]
        wstart = jnp.minimum((bs // LANE) * LANE, W - WIN)
        wstart = pl.multiple_of(wstart, LANE)
        srem = bs - wstart  # in [0, 128)

        dma_in = pltpu.make_async_copy(
            e_out.at[pl.ds(b * ROW_BLOCK, ROW_BLOCK), pl.ds(wstart, WIN)],
            win, sem_in,
        )
        dma_in.start()
        dma_in.wait()

        # strip lanes [0, swb) -> window lanes [srem, srem+swb)
        rot = _rotl(strip_ref[:, :], (WIN - srem) % WIN)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
        in_strip = (lane >= srem) & (lane < srem + swb)
        win[:, :] = jnp.where(in_strip, rot, win[:, :])

        dma_out = pltpu.make_async_copy(
            win,
            e_out.at[pl.ds(b * ROW_BLOCK, ROW_BLOCK), pl.ds(wstart, WIN)],
            sem_out,
        )
        dma_out.start()
        dma_out.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("swb", "interpret"))
def scatter_strips(E: jax.Array, strips: jax.Array, bs: jax.Array, swb: int,
                   *, interpret: bool | None = None) -> jax.Array:
    """E (H, W) f32, strips (nb, 8, WIN) f32 (values in lanes [0, swb), rest
    ignored), bs (nb,) i32 (each in [0, W - swb]) -> E with
    E[b*8:(b+1)*8, bs[b]:bs[b]+swb] = strips[b, :, :swb].

    The energy buffer is aliased in place; only the 8x256 windows move.
    H % 8 == 0, W % 128 == 0, W >= 256 required.
    """
    H, W = E.shape
    nb = int(bs.shape[0])
    if interpret is None:
        interpret = _interpret_default()
    return pl.pallas_call(
        _make_scatter_kernel(swb),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_BLOCK, WIN), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        input_output_aliases={2: 0},
        scratch_shapes=[
            pltpu.VMEM((ROW_BLOCK, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(bs.astype(jnp.int32), strips.reshape(nb * ROW_BLOCK, WIN), E)
