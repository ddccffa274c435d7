"""ROW_BLOCK sensitivity of the forward DP kernel (grid-overhead hypothesis).

A standalone parametrized copy of dp_forward — only the timing experiment;
the production kernel lives in pallas/dp_kernel.py.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 1080, 1920
N = 64
rng = np.random.default_rng(0)
Es = [jnp.asarray(rng.random((H, W), dtype=np.float32)) for _ in range(3)]
width = jnp.int32(W)


def make_fwd(R, unroll):
    def kernel(width_ref, e_ref, parents_ref, mlast_ref, carry):
        b = pl.program_id(0)
        colids = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        inf = jnp.float32(jnp.inf)
        wd = width_ref[0]
        lo = width_ref[1]
        in_win = (colids >= lo) & (colids < lo + wd)

        def row_fn(r, _):
            e_row = jnp.where(in_win, e_ref[pl.ds(r, 1), :], inf)
            prev = carry[:]
            left = pltpu.roll(prev, 1, axis=1)
            right = pltpu.roll(prev, W - 1, axis=1)
            left = jnp.where(colids == 0, inf, left)
            right = jnp.where(colids == W - 1, inf, right)
            m = e_row + jnp.minimum(jnp.minimum(left, prev), right)
            p = jnp.where(
                left <= prev,
                jnp.where(left <= right, -1, 1),
                jnp.where(prev <= right, 0, 1),
            ).astype(jnp.int32)
            is_first = jnp.logical_and(b == 0, r == 0)
            m = jnp.where(is_first, e_row, m)
            p = jnp.where(is_first, 0, p)
            carry[:] = m
            parents_ref[pl.ds(r, 1), :] = p.astype(parents_ref.dtype)
            return 0

        jax.lax.fori_loop(0, R, row_fn, 0, unroll=unroll)
        mlast_ref[:] = carry[:]

    @jax.jit
    def fwd(E, wd):
        wl = jnp.stack([wd, jnp.int32(0)])
        return pl.pallas_call(
            kernel,
            grid=(H // R,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((R, W), lambda b: (b, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((R, W), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, W), lambda b: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((H, W), jnp.int8),
                jax.ShapeDtypeStruct((1, W), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((1, W), jnp.float32)],
        )(wl, E)

    return fwd


def timeit(name, fn, reps=3):
    fn(Es[0])
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        out = fn(Es[(i + 1) % len(Es)])
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))[...]
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {best*1e3:8.2f} ms total  {best/N*1e3:7.3f} ms/iter",
          flush=True)


def loop(fwd):
    @jax.jit
    def run(E):
        def body(i, carry):
            e, acc = carry
            _, mlast = fwd(e, width)
            out = mlast[0, 0]
            e = e.at[0, :].add(out * 1e-30)
            return (e, acc + out)
        _, acc = jax.lax.fori_loop(0, N, body, (E, jnp.float32(0.0)))
        return acc
    return run


for R, unroll in [(8, True), (24, True), (40, 8), (120, 8), (216, 8),
                  (1080, 8)]:
    # verify parity on one call against the production kernel
    from dct_carver_tpu.pallas.dp_kernel import dp_forward
    fwd = make_fwd(R, unroll)
    p0, m0 = dp_forward(Es[0], width)
    p1, m1 = fwd(Es[0], width)
    ok = bool(jnp.array_equal(p0, p1) and jnp.array_equal(m0, m1))
    timeit(f"fwd R={R} unroll={unroll} parity={ok}", loop(fwd))
