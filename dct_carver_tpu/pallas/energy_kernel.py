"""Fused separable-DCT + argmax energy kernel (SURVEY §7.3a).

The XLA path (`ops/dct.py`) materializes per-atom DCT responses in HBM —
~n²× the image size of write+read traffic.  This kernel streams row slabs
HBM→VMEM once and keeps every intermediate (vertical DCT row, per-atom
response, running argmax) in VMEM, writing only the final (H, W) energy.

Math and conventions are identical to `ops.dct.energy_from_bands`
(`/root/reference/src/dct.c:96-110` semantics: max |AC coefficient|,
last-tie-wins in rank = kx·n + ky, DC excluded, edge/texture weighting of
atoms (0,1)/(1,0); window offsets per `src/render.c:146-151` ("carve") or
`src/dct.h:8-9` ("preview"); border clamping via edge padding).  The
multiply-add chains use the same order and the same f32-rounded constants as
the XLA chain path, so results are bitwise equal on TPU (verified on
hardware for all blocksizes); CPU interpret-mode comparisons carry ~ulp
LLVM-FMA noise (see tests/test_energy_kernel.py).

Batching: blocks have no cross-block carry, so a batch is just more grid
steps over a row-flattened (B·S, Wp) layout (S = per-image padded stride).
A `custom_vmap` rule routes `jax.vmap` (e.g. the batch-parallel carve in
parallel/mesh.py) to that flattened single-kernel form.

Structure per grid step (one R-row block of one image):
  * DMA an (R + n - 1)-row slab into VMEM (rows overlap between blocks —
    BlockSpecs cannot express that, hence the manual copy from ANY).
  * stage 1: for each ky, the vertical 1-D DCT row V_ky as an n-term
    multiply-add chain over static sublane-offset slab slices.
  * stage 2: per ky, the n static lane rotations of V_ky are built once;
    each atom response is an n-term chain with compile-time-constant taps,
    folded into the running (max, winner).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dp_kernel import _interpret_default
from ..ops.dct import _dct_matrix_np, window_offset

__all__ = ["dct_energy_pallas", "energy_pallas_supported"]

# output rows per grid step — small blocks keep in-kernel temporaries (~10
# (R, Wp) f32 arrays) near 1 MB so the kernel composes with VMEM-resident
# outputs and the fused DP kernel inside one carve program (R=64 measured
# the same speed standalone but overflows scoped VMEM in composition)
ROW_BLOCK = 8
LANE = 128

# slab + V + (max, winner) + out block, all (~ROW_BLOCK, Wp) f32 — keep the
# per-block VMEM footprint well under the ~16 MB/core budget
MAX_WP = 8192


def energy_pallas_supported(W: int, blocksize: int) -> bool:
    Wp = -(-(W + blocksize - 1) // LANE) * LANE
    return Wp <= MAX_WP


def _energy_chain_ops(D, n: int, R: int, Wp: int, slab_row, edges, textures):
    """Emit the fused stage-1/stage-2 energy chains for one R-row block.

    `slab_row(dy)` returns the (R, Wp) rows [dy, dy+R) of the padded luma
    slab.  Shared by the full-map kernel and the strip-energy kernel
    (strip_kernel.py) so both produce the IDENTICAL op sequence — the
    bitwise contract between the strip update and a full recompute reduces
    to this one function."""
    maxval = jnp.full((R, Wp), -jnp.inf, jnp.float32)
    winner = jnp.full((R, Wp), -1, jnp.int32)
    for ky in range(n):
        # stage 1 — vertical DCT row for this ky (same dy chain order as
        # ops.dct.energy_from_bands)
        v = D[ky, 0] * slab_row(0)
        for dy in range(1, n):
            v = v + D[ky, dy] * slab_row(dy)
        # lane c of sh[dx] holds v[c + dx] (right-rotate by Wp - dx);
        # wraparound lanes land beyond the valid W columns
        sh = [v] + [
            pltpu.roll(v, Wp - dx, axis=1) for dx in range(1, n)
        ]

        kx0 = 1 if ky == 0 else 0  # DC atom (0,0) excluded (src/dct.c:103)
        for kx in range(kx0, n):
            t = D[kx, 0] * sh[0]
            for dx in range(1, n):
                t = t + D[kx, dx] * sh[dx]
            a = jnp.abs(t)
            rank = kx * n + ky
            take_new = a > maxval
            tie = a == maxval
            winner = jnp.where(
                take_new, rank,
                jnp.where(tie, jnp.maximum(winner, rank), winner),
            )
            maxval = jnp.maximum(maxval, a)

    is_edge = (winner == 1) | (winner == n)  # atoms (0,1),(1,0)
    return maxval * jnp.where(is_edge, edges, textures)


def _make_kernel(n: int, R: int, Wp: int, slab_rows: int, nb: int,
                 stride: int):
    # DCT taps are compile-time f32 constants (same f32 rounding as the XLA
    # chain path) — immediate operands, no SMEM scalar loads in the hot loop
    D = np.asarray(_dct_matrix_np(n), np.float32)

    def kernel(fscal_ref, lp_ref, e_out, slab, sem):
        g = pl.program_id(0)
        e = g // nb   # image index within the flattened batch
        b = g % nb    # row block within the image
        off = pl.multiple_of(e * stride + b * R, 8)
        dma = pltpu.make_async_copy(
            lp_ref.at[pl.ds(off, slab_rows)], slab, sem
        )
        dma.start()
        dma.wait()

        e_out[:, :] = _energy_chain_ops(
            D, n, R, Wp, lambda dy: slab[dy : dy + R, :],
            fscal_ref[0], fscal_ref[1],
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("blocksize", "center", "interpret")
)
def _energy_pallas_batched(
    lumas: jax.Array,  # (B, H, W) f32
    blocksize: int,
    edges,
    textures,
    center: str = "carve",
    interpret: bool | None = None,
) -> jax.Array:
    if interpret is None:
        interpret = _interpret_default()
    n = blocksize
    B, H, W = lumas.shape
    R = ROW_BLOCK
    co = window_offset(n, center)
    pb, pa = -co, n - 1 + co  # window rows i+co .. i+co+n-1, edge-clamped

    nb = -(-H // R)
    slab_rows = -(-(R + n - 1) // 8) * 8  # DMA row slices are 8-row aligned
    # per-image stride: padded rows, rounded so every image starts 8-aligned
    # and the last slab of an image stays inside its own padding
    rows_needed = pb + H + pa + (nb * R - H) + (slab_rows - (R + n - 1))
    stride = -(-rows_needed // 8) * 8
    pad_bot = stride - pb - H
    Wp = -(-(W + n - 1) // LANE) * LANE
    lp = jax.vmap(
        lambda l: jnp.pad(
            l.astype(jnp.float32), ((pb, pad_bot), (pb, Wp - W - pb)),
            mode="edge",
        )
    )(lumas).reshape(B * stride, Wp)

    fscal = jnp.stack([
        jnp.asarray(edges, jnp.float32),
        jnp.asarray(textures, jnp.float32),
    ])

    out = pl.pallas_call(
        _make_kernel(n, R, Wp, slab_rows, nb, stride),
        grid=(B * nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((R, Wp), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nb * R, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(fscal, lp)
    return out.reshape(B, nb * R, Wp)[:, :H, :W]


@functools.lru_cache(maxsize=None)
def _energy_cv(blocksize: int, center: str, interpret: bool | None):
    """custom_vmap wrapper per static config: vmap maps to the flattened
    batched kernel instead of an (unsupported) batched BlockSpec."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(luma, edges, textures):
        return _energy_pallas_batched(
            luma[None], blocksize, edges, textures, center, interpret
        )[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, luma, edges, textures):
        luma_b, e_b, t_b = in_batched
        if not luma_b:
            luma = jnp.broadcast_to(luma[None], (axis_size, *luma.shape))
        if e_b or t_b:
            # per-image knobs: one kernel per image (rare path)
            out = jax.lax.map(
                lambda args: f(args[0], args[1], args[2]),
                (luma,
                 jnp.broadcast_to(jnp.asarray(edges), (axis_size,)) if not e_b
                 else edges,
                 jnp.broadcast_to(jnp.asarray(textures), (axis_size,)) if not t_b
                 else textures),
            )
        else:
            out = _energy_pallas_batched(
                luma, blocksize, edges, textures, center, interpret
            )
        return out, True

    return f


def dct_energy_pallas(
    luma: jax.Array,
    blocksize: int,
    edges,
    textures,
    *,
    center: str = "carve",
    interpret: bool | None = None,
) -> jax.Array:
    """(H, W) f32 luma -> (H, W) f32 energy; same contract as
    `ops.dct.dct_energy_map` (bitwise-equal values on TPU).  Composable with
    `jax.vmap` (batch lowers to one flattened kernel launch)."""
    return _energy_cv(blocksize, center, interpret)(
        luma, jnp.asarray(edges, jnp.float32),
        jnp.asarray(textures, jnp.float32),
    )
