"""Sub-stage timing of _recompute_strip at 1080p (loop-amortized)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from dct_carver_tpu.ops.carve import (
    make_state, full_energy_map, STRIP_ROW_BLOCK, _strip_bounds,
)
from dct_carver_tpu.ops.dct import energy_from_bands
from dct_carver_tpu.ops.dp import remove_seam

H, W = 1080, 1920
N = 64
n, r, R = 8, 4, STRIP_ROW_BLOCK
rng = np.random.default_rng(0)
lumas = [jnp.asarray(rng.random((H, W), dtype=np.float32)) for _ in range(3)]


@jax.jit
def prep(luma):
    state = make_state(luma)
    return state._replace(energy=full_energy_map(luma, 8, 0.0, 1.0))


states = [jax.block_until_ready(prep(l)) for l in lumas]


def timeit(name, fn, args_list, reps=3):
    fn(args_list[0])
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        out = fn(args_list[(i + 1) % len(args_list)])
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))[...]
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1e3:8.2f} ms total  {best/N*1e3:7.3f} ms/iter")
    return best


def fake_seam(i, width):
    return jnp.broadcast_to((i * 37) % (width - 1), (H,)).astype(jnp.int32)


nb = -(-H // R)
pad_h = nb * R - H
half = (n // 2) * 2 + 1
strip_w = 2 * half + 2
swb = strip_w + (R - 1)
gwb = swb + n - 1


# (a) pad copy only
@jax.jit
def loop_pad(state):
    def body(i, s):
        lp = jnp.pad(s.luma, ((r - 1, r + pad_h), (r - 1, r)), mode="edge")
        return s._replace(luma=lp[r - 1 : r - 1 + H, r - 1 : r - 1 + W] + 0.0)
    return jax.lax.fori_loop(0, N, body, state).luma[0, 0]


timeit("(a) pad-copy + unpad x64", loop_pad, states)


# (b) E compact only
@jax.jit
def loop_ecompact(state):
    def body(i, s):
        seam = fake_seam(i, s.width)
        return s._replace(energy=remove_seam(s.energy, seam),
                          width=s.width - 1)
    st = jax.lax.fori_loop(0, N, body, state)
    return st.energy[0, 0]


timeit("(b) E-compact x64", loop_ecompact, states)


# (c) slab extraction (vmapped dynamic_slice) only
@jax.jit
def loop_slab(state):
    def body(i, carry):
        luma, acc = carry
        seam = fake_seam(i, jnp.int32(W))
        start, _ = _strip_bounds(seam, n, W, 1)
        lp = jnp.pad(luma, ((r - 1, r + pad_h), (r - 1, r)), mode="edge")
        start_p = jnp.pad(start, (0, pad_h), mode="edge").reshape(nb, R)
        bs = jnp.clip(jnp.min(start_p, axis=1), 0, max(W - swb, 0))
        slabs = jax.vmap(
            lambda k, b: jax.lax.dynamic_slice(lp, (k, b), (R + n - 1, gwb))
        )(jnp.arange(nb, dtype=jnp.int32) * R, bs)
        return (luma, acc + slabs[0, 0, 0])
    _, acc = jax.lax.fori_loop(0, N, body, (state.luma, jnp.float32(0)))
    return acc


timeit("(c) pad + slab-gather x64", loop_slab, states)


# (d) bands + energy_from_bands only (static slab input)
@jax.jit
def loop_energy(state):
    slabs0 = jnp.ones((nb, R + n - 1, gwb), jnp.float32)

    def body(i, acc):
        slabs = slabs0 + acc * 1e-30
        bands = jnp.stack(
            [slabs[:, rr : rr + n, :] for rr in range(R)], axis=1)
        e = energy_from_bands(
            bands.reshape(nb * R, n, gwb), n, 0.0, 1.0
        ).astype(jnp.float32)
        return acc + e[0, 0]
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))


timeit("(d) bands+energy_from_bands x64", loop_energy, states)


# (e) blockwise writeback only
@jax.jit
def loop_write(state):
    strip0 = jnp.ones((nb, R, swb), jnp.float32)

    def body(i, s):
        seam = fake_seam(i, s.width)
        start, _ = _strip_bounds(seam, n, W, 1)
        start_p = jnp.pad(start, (0, pad_h), mode="edge").reshape(nb, R)
        bs = jnp.clip(jnp.min(start_p, axis=1), 0, max(W - swb, 0))
        E_blocks = jnp.pad(s.energy, ((0, pad_h), (0, 0))).reshape(nb, R, W)
        out = jax.vmap(
            lambda e, st, b: jax.lax.dynamic_update_slice(e, st, (0, b))
        )(E_blocks, strip0 + s.energy[0, 0] * 1e-30, bs)
        return s._replace(energy=out.reshape(nb * R, W)[:H],
                          width=s.width - 1)
    return jax.lax.fori_loop(0, N, body, state).energy[0, 0]


timeit("(e) blockwise writeback x64", loop_write, states)
