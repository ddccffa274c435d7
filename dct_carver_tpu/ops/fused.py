"""Fused TPU carve engine — EXPERIMENTAL alternative to the default path.

Status: bit-identical visibility maps to `carve_n_seams` (tests/test_fused.py,
verified on real TPU), but currently SLOWER than the production configuration
(Pallas DP + XLA apply: 2.9 ms/seam at 1080p vs ~9 ms here) and expensive to
compile on Mosaic.  Not wired into the model layer yet; kept as the substrate
for the next optimization round (batched strip stage, double-buffered slab
DMA).


Same contract as `ops.carve.carve_n_seams` (identical visibility maps), but
each seam iteration is two Pallas kernels instead of a dozen XLA ops:

    find_seam_pallas  — DP forward (frontier in VMEM) + on-chip backtrack
    seam_apply        — compaction + edge fill + strip energy, one pass

State lives in a column-padded layout (see pallas/seam_kernel.py): `lo`
left-pad columns replicating logical column 0, right padding to a lane
multiple, logical window [lo, lo+width).  The padding makes every window and
strip slice interior, so the reference's border clamping
(src/render.c:122-132) is free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .carve import CarveState
from .dct import dct_energy_map
from ..pallas.dp_kernel import (
    find_seam_pallas, pallas_supported, ROW_BLOCK, LANE,
)
from ..pallas.seam_kernel import seam_apply, pad_lo

__all__ = ["fused_carve_n_seams", "fused_supported"]


def fused_supported(H: int, W: int, blocksize: int) -> bool:
    return (
        H % ROW_BLOCK == 0
        and W > 2 * blocksize + 4  # strip must fit the logical window
    )


def _padded_width(W: int, blocksize: int) -> int:
    lo = pad_lo(blocksize)
    need = lo + W + blocksize // 2
    # >= 256 so the kernel's 128-aligned 256-lane windows always fit
    return max(-(-need // LANE) * LANE, 256)


@functools.partial(
    jax.jit, static_argnames=("n_seams", "blocksize", "interpret")
)
def fused_carve_n_seams(
    luma: jax.Array,
    n_seams: int,
    blocksize: int,
    edges,
    textures,
    *,
    interpret: bool | None = None,
) -> CarveState:
    """Remove `n_seams` seams with the fused Pallas pipeline.

    Returns a CarveState with UNPADDED views (same shapes/semantics as
    `carve_n_seams`); the energy/luma dead regions follow the same
    conventions (edge fill; energy garbage beyond width).
    """
    H, W = luma.shape
    n = blocksize
    lo = pad_lo(n)
    Wp = _padded_width(W, n)

    luma_p = jnp.pad(
        luma.astype(jnp.float32), ((0, 0), (lo, Wp - lo - W)), mode="edge"
    )
    # energy of the padded plane: at logical columns the windows see exactly
    # the edge-clamped values, so this equals the unpadded energy map there
    E_p = dct_energy_map(luma_p, n, edges, textures).astype(jnp.float32)
    origcol_p = jnp.pad(
        jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32), (H, W)),
        ((0, 0), (lo, Wp - lo - W)),
    )
    vmap = jnp.zeros((H, W), jnp.int32)
    rows = jnp.arange(H)

    def body(i, st):
        luma_p, E_p, origcol_p, vmap, width = st
        seam_p = find_seam_pallas(E_p, width, jnp.int32(lo),
                                  interpret=interpret)
        new_width = width - 1
        luma_p, E_p, origcol_p, orig = seam_apply(
            luma_p, E_p, origcol_p, seam_p, new_width, n, edges, textures,
            interpret=interpret,
        )
        vmap = vmap.at[rows, orig].set(i + 1)
        return (luma_p, E_p, origcol_p, vmap, new_width)

    width0 = jnp.asarray(W, jnp.int32)
    luma_p, E_p, origcol_p, vmap, width = jax.lax.fori_loop(
        0, n_seams, body, (luma_p, E_p, origcol_p, vmap, width0)
    )

    return CarveState(
        luma=luma_p[:, lo : lo + W],
        origcol=origcol_p[:, lo : lo + W],
        vmap=vmap,
        width=width,
        energy=E_p[:, lo : lo + W],
    )
