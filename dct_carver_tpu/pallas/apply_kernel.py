"""Fused seam-application kernel: compact all carve buffers in ONE pass.

After a seam is found, the carve must (a) compact the luma plane, the
original-column map and the energy map around the seam (column j of the
result is buf[:, j] for j < seam[row] and buf[:, j+1] after), and (b)
edge-fill the luma dead region (columns >= the new logical width) with the
new logical edge value so window clamping keeps matching the reference's
border behavior (/root/reference/src/render.c:146-151).

As separate XLA ops this is 3 roll+select passes plus an edge-fill pass —
each a full (H, W) read+write.  This kernel does all of it in one grid sweep
over 8-row blocks: every buffer is read once and written once (~50 MB/seam
at 1080p, the traffic floor for a compacting representation), with the
per-row seam columns broadcast from an (R, 1) block and the shift done as a
static lane roll + select.

Values are bitwise-identical to ops/dp.remove_seam + ops/carve._edge_fill:
same select, same roll, and the dead-region fill value is computed by the
caller with the same take-from-shifted rule (tests/test_apply_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dp_kernel import _interpret_default, pallas_supported, _pick_row_block

__all__ = ["apply_seam_pallas", "apply_pallas_supported", "new_edge_value"]

ROW_BLOCK = 8


def apply_pallas_supported(H: int, W: int) -> bool:
    return pallas_supported(H, W)


def _apply_row_block(H: int, W: int, batched: bool = False) -> int:
    """Rows per grid step: big blocks amortize the per-step grid/DMA setup
    (dominant at batch scale: 2048 8-row steps -> 1.9 ms vs a 0.58 ms
    traffic floor for config 4), bounded so the in/out (R, W) f32 buffers
    stay inside VMEM double-buffered.  Single-image carves are latency-bound
    per seam and measured fastest with moderate blocks (R<=64, no aliasing);
    the flat batch path wants the tallest blocks."""
    cands = ((128, 120, 112, 104, 96, 88, 80, 72, 64, 56, 48, 40, 32, 24,
              16, 8) if batched else (64, 56, 48, 40, 32, 24, 16, 8))
    for R in cands:
        if H % R == 0 and 12 * R * W * 4 <= 14 * 1024 * 1024:
            return R
    return ROW_BLOCK


def new_edge_value(luma: jax.Array, seam: jax.Array,
                   width: jax.Array) -> jax.Array:
    """(H, 1) value the dead region is filled with after removing `seam`:
    the compacted row's element at the new logical edge (new_width - 1),
    i.e. luma[:, width-2] when the seam removes the edge column itself,
    else luma[:, width-1] — exactly what _edge_fill reads from the shifted
    array.  One tiny XLA gather; the heavy lifting stays in the kernel."""
    H = luma.shape[0]
    col = jnp.where(seam[:, None] == width - 1, width - 2, width - 1)
    return jnp.take_along_axis(luma, jnp.broadcast_to(col, (H, 1)), axis=1)


def _make_apply_kernel(blocks_per_image: int):
    def kernel(width_ref, seam_ref, edge_ref, luma_ref, oc_ref, e_ref,
               luma_out, oc_out, e_out):
        g = pl.program_id(0)
        e_img = g // blocks_per_image      # image index in the flat batch
        R, W = luma_ref.shape
        colids = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        new_width = width_ref[e_img] - 1
        seam_blk = seam_ref[:, :]          # (R, 1) int32
        keep = colids < seam_blk           # (R, W) per-row compaction mask

        def compact(ref):
            x = ref[:, :]
            return jnp.where(keep, x, pltpu.roll(x, W - 1, axis=1))

        luma = compact(luma_ref)
        luma_out[:, :] = jnp.where(colids >= new_width, edge_ref[:, :], luma)
        oc_out[:, :] = compact(oc_ref)
        e_out[:, :] = compact(e_ref)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _apply_seam_batched(luma, origcol, energy, seam, edge_new, width, *,
                        interpret: bool | None = None):
    """Flattened batch form: (B, H, W) buffers, (B, H) seam, (B, H, 1) edge,
    (B,) width.  Blocks never straddle images (H % ROW_BLOCK == 0), so the
    batch is just more grid steps over the row-flattened layout."""
    B, H, W = luma.shape
    if interpret is None:
        interpret = _interpret_default()
    R = _apply_row_block(H, W, batched=B > 1)
    nb = H // R
    grid = (B * nb,)
    blk = lambda g: (g, 0)
    out = pl.pallas_call(
        _make_apply_kernel(nb),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, W), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W), blk, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, W), luma.dtype),
            jax.ShapeDtypeStruct((B * H, W), jnp.int32),
            jax.ShapeDtypeStruct((B * H, W), jnp.float32),
        ],
        # in-place on the batch path: each block's outputs overwrite its own
        # already-consumed input block (compaction reads only within the
        # block) — saves 3 full-buffer allocations+copies per batch seam.
        # Single-image carves measured ~2% SLOWER with aliasing (an extra
        # while-loop copy), so they keep fresh outputs.
        input_output_aliases=({3: 0, 4: 1, 5: 2} if B > 1 else {}),
        interpret=interpret,
    )(jnp.broadcast_to(jnp.asarray(width, jnp.int32), (B,)),
      seam.reshape(B * H, 1), edge_new.reshape(B * H, 1),
      luma.reshape(B * H, W), origcol.reshape(B * H, W),
      energy.reshape(B * H, W))
    return tuple(o.reshape(B, H, W) for o in out)


@functools.lru_cache(maxsize=None)
def _apply_cv(interpret: bool | None):
    """custom_vmap wrapper: `jax.vmap` maps to the flattened batched kernel
    instead of the (Mosaic-unsupported) generic batched BlockSpec rule."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(luma, origcol, energy, seam, edge_new, width):
        out = _apply_seam_batched(
            luma[None], origcol[None], energy[None], seam[None],
            edge_new[None], width, interpret=interpret,
        )
        return tuple(o[0] for o in out)

    @f.def_vmap
    def _rule(axis_size, in_batched, luma, origcol, energy, seam, edge_new,
              width):
        def bcast(x, batched):
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size, *x.shape))

        args = [bcast(x, b) for x, b in zip(
            (luma, origcol, energy, seam, edge_new), in_batched[:5])]
        width = jnp.broadcast_to(jnp.asarray(width, jnp.int32), (axis_size,))
        out = _apply_seam_batched(*args, width, interpret=interpret)
        return out, (True, True, True)

    return f


def apply_seam_pallas(luma: jax.Array, origcol: jax.Array, energy: jax.Array,
                      seam: jax.Array, edge_new: jax.Array, width: jax.Array,
                      *, interpret: bool | None = None):
    """Compact (luma, origcol, energy) around `seam` in one fused pass.

    luma/energy (H, W) f32, origcol (H, W) i32, seam (H,) i32,
    edge_new (H, 1) f32 from `new_edge_value`, width () i32 (logical width
    BEFORE removal).  Returns (luma', origcol', energy') with luma' edge-
    filled at columns >= width-1.  H % 8 == 0, W % 128 == 0 required.
    Composable with `jax.vmap` (batch lowers to one flattened kernel)."""
    return _apply_cv(interpret)(
        luma, origcol, energy, seam, edge_new,
        jnp.asarray(width, jnp.int32),
    )
