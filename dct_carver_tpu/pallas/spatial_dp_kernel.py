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

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dp_kernel import _interpret_default

__all__ = ["block_dp_rows", "block_dp_supported",
           "seg_walk_rows", "seg_walk_supported"]

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


def _make_block_dp_kernel(Kb: int, W2: int):
    # inputs arrive pre-widened by a +inf LANE tail: rolls wrap through it,
    # so the two edge selects vanish from the dependent chain (see
    # dp_kernel._fused_seam_body); the widening happens OUTSIDE the kernel
    # (a constant tail concatenated inside trips interpret-mode vma checks)

    def kernel(prev_ref, e_ref, out_ref):
        prev = prev_ref[:, :]
        rows = []
        for r in range(Kb):  # static rows, frontier register-resident
            e_row = e_ref[r : r + 1, :]
            left = pltpu.roll(prev, 1, axis=1)
            right = pltpu.roll(prev, W2 - 1, axis=1)  # == shift -1
            # same op order as the scan row: E + min(min(left, center), right)
            m = e_row + jnp.minimum(jnp.minimum(left, prev), right)
            rows.append(m)
            prev = m
        out_ref[:, :] = jnp.concatenate(rows, axis=0)

    return kernel


def block_dp_rows(ext_prev: jax.Array, ext_E: jax.Array, *,
                  interpret: bool | None = None) -> jax.Array:
    """One K-row DP block: ext_prev (We,) f32 frontier, ext_E (Kb, We) f32
    (both pre-masked to +inf outside the valid window) -> (Kb, We) f32 M
    rows.  Bitwise identical to the per-row scan (add/min only).
    We % 128 == 0 required (`block_dp_supported`)."""
    Kb, We = ext_E.shape
    if interpret is None:
        interpret = _interpret_default()
    inf = jnp.float32(jnp.inf)
    prev2 = jnp.pad(ext_prev[None, :], ((0, 0), (0, LANE)),
                    constant_values=inf)
    E2 = jnp.pad(ext_E, ((0, 0), (0, LANE)), constant_values=inf)
    if interpret:
        # same op sequence as the kernel in plain jax (jnp.roll == pltpu.roll
        # semantics; add/min are exact, so this is bitwise-equivalent to the
        # compiled kernel) — the pallas interpreter cannot run grid carries
        # under shard_map's vma checking
        return _plain_block_dp(prev2, E2, Kb)[:, :We]
    out = pl.pallas_call(
        _make_block_dp_kernel(Kb, We + LANE),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=_out_struct((Kb, We + LANE), jnp.float32, ext_E),
        interpret=False,
    )(prev2, E2)
    return out[:, :We]


def _plain_block_dp(prev2, E2, Kb):
    W2 = E2.shape[1]
    prev = prev2
    rows = []
    for r in range(Kb):
        e_row = E2[r : r + 1, :]
        left = jnp.roll(prev, 1, axis=1)
        right = jnp.roll(prev, W2 - 1, axis=1)
        m = e_row + jnp.minimum(jnp.minimum(left, prev), right)
        rows.append(m)
        prev = m
    return jnp.concatenate(rows, axis=0)


# ---------------------------------------------------------------- backtrack --

def seg_walk_supported(K: int, delta_x: int = 1) -> bool:
    return delta_x == 1 and 2 * K + 1 <= LANE


def _make_seg_walk_kernel(Kb: int, ww: int, j0: int):
    CW = LANE

    def kernel(win_ref, seg_ref):
        inf = jnp.float32(jnp.inf)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, CW), 1)
        colsb = jax.lax.broadcasted_iota(jnp.int32, (Kb, CW), 1)
        wp = jnp.where(colsb < ww, win_ref[:, :], inf)
        # vectorized per-cell parent direction — identical tie rules to the
        # scalar 3-window argmin (leftmost min): see dp_kernel forward
        left = jnp.where(colsb == 0, inf, pltpu.roll(wp, 1, axis=1))
        right = jnp.where(colsb == CW - 1, inf,
                          pltpu.roll(wp, CW - 1, axis=1))
        pall = jnp.where(
            left <= wp,
            jnp.where(left <= right, -1, 1),
            jnp.where(wp <= right, 0, 1),
        )
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
                  interpret: bool | None = None) -> jax.Array:
    """Backtrack one segment: win (Kb, ww) f32 M-rows (ww = 2K+1 <= 128),
    starting at local position `j0` below the last row -> (Kb,) i32 local
    positions, walking bottom-up with the leftmost-min 3-window rule.
    Bitwise identical to the scalar dynamic-slice scan."""
    Kb, ww = win.shape
    if interpret is None:
        interpret = _interpret_default()
    winp = jnp.pad(win, ((0, 0), (0, LANE - ww)),
                   constant_values=jnp.inf)
    seg = pl.pallas_call(
        _make_seg_walk_kernel(Kb, ww, j0),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=_out_struct((Kb, 1), jnp.int32, win),
        interpret=interpret,
    )(winp)
    return seg[:, 0]
