"""Per-iteration floor + effective HBM bandwidth of a fori_loop at 1080p."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

H, W = 1080, 1920
N = 64
rng = np.random.default_rng(0)
xs = [jnp.asarray(rng.random((H, W), dtype=np.float32)) for _ in range(3)]


def timeit(name, fn, args_list, reps=3, traffic_mb=None):
    fn(args_list[0])
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        out = fn(args_list[(i + 1) % len(args_list)])
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))[...]
        best = min(best, time.perf_counter() - t0)
    bw = ""
    if traffic_mb:
        bw = f"  -> {traffic_mb * 1e6 / (best / N) / 1e9:7.1f} GB/s"
    print(f"{name:40s} {best*1e3:8.2f} ms total  {best/N*1e3:7.3f} ms/iter{bw}")
    return best


mb = H * W * 4 / 1e6

# 1 full read+write pass per iteration
@jax.jit
def loop_add(x):
    return jax.lax.fori_loop(0, N, lambda i, v: v + 1e-30, x)[0, 0]

timeit("x + eps (1 pass, 2x8.3MB)", loop_add, xs, traffic_mb=2 * mb)


# 2-array pass per iteration
@jax.jit
def loop_add2(x):
    def body(i, c):
        a, b = c
        return (a + b * 1e-30, b + a * 1e-30)
    return jax.lax.fori_loop(0, N, body, (x, x * 2))[0][0, 0]

timeit("2-array pass (4x8.3MB)", loop_add2, xs, traffic_mb=4 * mb)


# roll+select compaction-like pass
@jax.jit
def loop_roll(x):
    col = jnp.arange(W)[None, :]
    def body(i, v):
        shifted = jnp.roll(v, -1, axis=1)
        return jnp.where(col < (i % W), v, shifted)
    return jax.lax.fori_loop(0, N, body, x)[0, 0]

timeit("roll+select (2x8.3MB)", loop_roll, xs, traffic_mb=2 * mb)


# tiny body: scalar-only carry
@jax.jit
def loop_scalar(x):
    return jax.lax.fori_loop(
        0, N, lambda i, v: v * 0.9999999 + 1e-30, x[0, 0])

timeit("scalar-only body (floor)", loop_scalar, xs)


# 8 passes per iteration
@jax.jit
def loop_add8(x):
    def body(i, v):
        for _ in range(8):
            v = v + 1e-30
        return v
    return jax.lax.fori_loop(0, N, body, x)[0, 0]

timeit("8 chained adds (16x8.3MB)", loop_add8, xs, traffic_mb=16 * mb)
