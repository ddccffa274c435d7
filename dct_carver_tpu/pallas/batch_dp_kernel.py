"""Batch-VECTORIZED seam DP: one row recurrence advances ALL images at once.

The flattened batch form in dp_kernel.py runs images back-to-back through the
grid, so the DP's sequential row chain costs B * H latency-bound VPU steps —
on a (1, W) row each op uses 1/8 of the VPU's sublanes.  Here the batch is
packed into the SUBLANE dimension instead: the layout is row-interleaved
(H*B, W) with row i*B + b = image b's row i, the frontier carry is a (B, W)
block, and every recurrence op processes B images in the same VPU
instruction.  The serial chain length drops from B*H to H; per-image DP cost
falls ~8x for B >= 8 (measured ~3x end-to-end on BASELINE config 4, where
apply/strip then dominate).

Values are bitwise-identical per image to dp_kernel.py's fused kernel and to
ops/dp.py's scan (same op order `E + min(min(left, center), right)`, same
leftmost tie rules; `pltpu.roll` on axis=1 rotates each sublane row
independently, so images never mix).  Parents stream to HBM as int8
(VMEM cannot hold B images' parents), and a second kernel walks all B
backtracks simultaneously as one-hot sublane rows.

Reference analog: the DP inside liblqr's `lqr_carver_resize`
(/root/reference/src/render.c:377) batched over independent plugin
invocations (`render()` per-image independence, src/render.c:327).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dp_kernel import (_interpret_default, _parent_select, pallas_supported,
                        ROW_BLOCK)

__all__ = ["find_seams_vec", "vec_supported"]

# (R*B, W) f32 energy block + parents + carry + temporaries per grid step
MAX_BLOCK_BYTES = 6 * 1024 * 1024


def vec_supported(B: int, H: int, W: int) -> bool:
    return (B >= 2 and pallas_supported(H, W)
            and ROW_BLOCK * B * W * 4 <= MAX_BLOCK_BYTES)


def _make_vec_dp_kernel(B: int, R: int, rightmost: bool = False):
    LANE = 128

    def kernel(wl_ref, e_ref, parents_ref, mlast_ref, carry):
        # Carry rows widened by one 128-lane +inf dead tail so the lane
        # rolls wrap through it — removes the two edge-masking selects from
        # the latency-bound chain (see dp_kernel._fused_seam_body).
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        W = e_ref.shape[1]
        W2 = W + LANE
        colids = jax.lax.broadcasted_iota(jnp.int32, (B, W2), 1)
        inf = jnp.float32(jnp.inf)
        width = wl_ref[:, 0:1]   # (B, 1)
        lo = wl_ref[:, 1:2]
        in_win = (colids >= lo) & (colids < lo + width)

        @pl.when(b == 0)
        def _():
            # m0 = e0 + min(0,0,0) = e0 in every comparison (dp_kernel.py)
            carry[:] = jnp.zeros((B, W2), jnp.float32)

        eblk = jnp.concatenate(
            [e_ref[:, :], jnp.full((R * B, LANE), inf, jnp.float32)], axis=1
        )                                       # (R*B, W2)
        prev = carry[:]
        pb = []
        for r in range(R):                      # static image-rows per block
            e_row = jnp.where(in_win, eblk[r * B:(r + 1) * B, :], inf)
            left = pltpu.roll(prev, 1, axis=1)
            right = pltpu.roll(prev, W2 - 1, axis=1)   # == shift -1
            m = e_row + jnp.minimum(jnp.minimum(left, prev), right)
            p = _parent_select(left, prev, right, rightmost).astype(jnp.int8)
            prev = m
            pb.append(p[:, :W])
        carry[:] = prev
        parents_ref[:, :] = jnp.concatenate(pb, axis=0)

        @pl.when(b == nb - 1)
        def _():
            mlast_ref[:, :] = carry[:, :W]

    return kernel


def _make_vec_bt_kernel(B: int, R: int):
    def kernel(jlast_ref, parents_ref, seam_ref, oh):
        b = pl.program_id(0)
        W = parents_ref.shape[1]
        colids = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)

        @pl.when(b == 0)
        def _():
            oh[:] = (colids == jlast_ref[:, :]).astype(jnp.int32)

        blk = parents_ref[:, :].astype(jnp.int32)  # (R*B, W), rows reversed blocks
        o = oh[:]
        for r in range(R - 1, -1, -1):             # image-rows bottom-up
            js = jnp.max(o * colids, axis=1, keepdims=True)   # (B, 1)
            seam_ref[r * B:(r + 1) * B, :] = js
            pr = blk[r * B:(r + 1) * B, :]
            o = (pltpu.roll(o * (pr == -1), W - 1, axis=1)
                 + o * (pr == 0)
                 + pltpu.roll(o * (pr == 1), 1, axis=1))
        oh[:] = o

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "tie"))
def find_seams_vec(E: jax.Array, width: jax.Array, lo: jax.Array, *,
                   interpret: bool | None = None,
                   tie: str = "leftmost") -> jax.Array:
    """E (B, H, W) f32, width/lo (B,) i32 -> (B, H) i32 seams; decisions
    bitwise-identical per image to `dp_kernel.find_seam_pallas`."""
    B, H, W = E.shape
    if interpret is None:
        interpret = _interpret_default()
    # taller blocks cut the serial grid-step count (the forward is a
    # latency-bound chain; per-step scheduling overhead is pure loss);
    # bounded so eblk + in/out blocks stay inside VMEM double-buffered
    R = next((r for r in (32, 24, 16, 8)
              if H % r == 0 and r * B * (W + 128) * 4 * 3 <= 10 * 1024 * 1024),
             ROW_BLOCK)
    nb = H // R
    E_t = E.transpose(1, 0, 2).reshape(H * B, W)
    wl = jnp.stack([
        jnp.broadcast_to(jnp.asarray(width, jnp.int32), (B,)),
        jnp.broadcast_to(jnp.asarray(lo, jnp.int32), (B,)),
    ], axis=1)

    parents, mlast = pl.pallas_call(
        _make_vec_dp_kernel(B, R, tie == "rightmost"),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((R * B, W), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R * B, W), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, W), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H * B, W), jnp.int8),
            jax.ShapeDtypeStruct((B, W), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, W + 128), jnp.float32)],  # inf tail
        interpret=interpret,
    )(wl, E_t)

    col = jnp.arange(W)[None, :]
    masked = jnp.where(
        (col >= wl[:, 1:2]) & (col < wl[:, 1:2] + wl[:, 0:1]),
        mlast, jnp.inf,
    )
    if tie == "leftmost":
        j_last = jnp.argmin(masked, axis=1).astype(jnp.int32)
    else:
        j_last = (W - 1 - jnp.argmin(masked[:, ::-1], axis=1)
                  ).astype(jnp.int32)  # rightmost per image

    seam_t = pl.pallas_call(
        _make_vec_bt_kernel(B, R),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((R * B, W), lambda g: (nb - 1 - g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R * B, 1), lambda g: (nb - 1 - g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H * B, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, W), jnp.int32)],
        interpret=interpret,
    )(j_last.reshape(B, 1), parents)
    return seam_t.reshape(H, B).T
