"""DP-kernel stage timing on the attached TPU: forward vs backtrack vs fused,
and ROW_BLOCK sensitivity (grid-step overhead hypothesis).

Each candidate runs 64 serialized iterations inside ONE jit (tunnel dispatch
is ~20 ms, and identical repeated calls can be cached — see DESIGN.md quirks).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from dct_carver_tpu.pallas import dp_kernel as dpk

H, W = 1080, 1920
N = 64
rng = np.random.default_rng(0)
Es = [jnp.asarray(rng.random((H, W), dtype=np.float32)) for _ in range(3)]
width = jnp.int32(W)


def timeit(name, fn, args_list, reps=3):
    fn(args_list[0])
    best = float("inf")
    for i in range(reps):
        a = args_list[(i + 1) % len(args_list)]
        t0 = time.perf_counter()
        out = fn(a)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))[...]
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {best*1e3:8.2f} ms total  {best/N*1e3:7.3f} ms/iter",
          flush=True)
    return best


def loop(fn):
    @jax.jit
    def run(E):
        def body(i, carry):
            e, acc = carry
            out = fn(e)
            e = e.at[0, :].add(out.astype(jnp.float32) * 1e-30)
            return (e, acc + out)
        _, acc = jax.lax.fori_loop(0, N, body, (E, jnp.float32(0.0)))
        return acc
    return run


# fused single-kernel path (production)
timeit("fused find_seam (current)", loop(
    lambda e: dpk._fused_find_seam(e, width, jnp.int32(0))[0].astype(jnp.float32)
), Es)

# forward only (two-kernel path)
timeit("dp_forward only", loop(
    lambda e: dpk.dp_forward(e, width)[1][0, 0]
), Es)

# forward + argmin (no backtrack)
def fwd_argmin(e):
    parents, mlast = dpk.dp_forward(e, width)
    return jnp.argmin(mlast[0]).astype(jnp.float32) + parents[0, 0]

timeit("dp_forward + argmin", loop(fwd_argmin), Es)

# full two-kernel path
def two_kernel(e):
    parents, mlast = dpk.dp_forward(e, width)
    j = jnp.argmin(mlast[0]).astype(jnp.int32)
    return dpk.dp_backtrack(parents, j)[0].astype(jnp.float32)

timeit("two-kernel fwd+argmin+backtrack", loop(two_kernel), Es)
