"""Loop-amortized per-stage timing of the seam iteration at 1080p.

One tunnel dispatch costs ~20 ms, so each stage is timed as a 64-iteration
`lax.fori_loop` inside ONE jit (with a data dependency so XLA cannot hoist),
mirroring how the stages run inside carve_n_seams.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from dct_carver_tpu.ops.carve import (
    make_state, full_energy_map, _one_seam, carve_n_seams,
    _edge_fill, _recompute_strip,
)
from dct_carver_tpu.ops.dp import remove_seam
from dct_carver_tpu.pallas.dp_kernel import find_seam_pallas

H, W = 1080, 1920
N = 64
rng = np.random.default_rng(0)
lumas = [jnp.asarray(rng.random((H, W), dtype=np.float32)) for _ in range(3)]


@jax.jit
def prep(luma):
    state = make_state(luma)
    return state._replace(energy=full_energy_map(luma, 8, 0.0, 1.0))


states = [jax.block_until_ready(prep(l)) for l in lumas]


def timeit(name, fn, args_list, reps=3):
    fn(args_list[0])  # compile
    best = float("inf")
    for i in range(reps):
        a = args_list[(i + 1) % len(args_list)]
        t0 = time.perf_counter()
        out = fn(a)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))[...]
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1e3:8.2f} ms total  {best/N*1e3:7.3f} ms/iter")
    return best


# --- find_seam only, 64x, serialized via energy perturbation ---------------
@jax.jit
def loop_find(state):
    def body(i, carry):
        e, acc = carry
        seam = find_seam_pallas(e, state.width)
        # cheap dependency: add a tiny seam-dependent value to one row
        e = e.at[0, :].add(seam[0].astype(jnp.float32) * 1e-30)
        return (e, acc + seam[0])
    e, acc = jax.lax.fori_loop(0, N, body, (state.energy, jnp.int32(0)))
    return acc


timeit("find_seam x64 (fused pallas)", loop_find, states)


def _digest(s):
    """Scalar that depends on every state buffer (defeats DCE)."""
    return (s.luma[0, 0] + s.energy[0, 0]
            + s.origcol[0, 0].astype(jnp.float32)
            + s.vmap[0, 0].astype(jnp.float32))


def _fake_seam(i, s):
    # row-constant fake seam that drifts with i; cheap to build
    return jnp.broadcast_to((i * 37) % (s.width - 1), (H,)).astype(jnp.int32)


# --- apply only, 64x (fake seam, serialized through state) ------------------
@jax.jit
def loop_apply(state):
    def body(i, s):
        seam = _fake_seam(i, s)
        rows = jnp.arange(H)
        orig = s.origcol[rows, seam]
        vmap = s.vmap.at[rows, orig].set(i + 1)
        new_width = s.width - 1
        lm = _edge_fill(remove_seam(s.luma, seam), new_width)
        oc = remove_seam(s.origcol, seam)
        mid = s._replace(luma=lm, width=new_width)
        en = _recompute_strip(mid, seam, 8, 0.0, 1.0, 1)
        return s._replace(luma=lm, origcol=oc, vmap=vmap,
                          width=new_width, energy=en)

    return _digest(jax.lax.fori_loop(0, N, body, state))


timeit("apply x64 (compact+edgefill+strip)", loop_apply, states)


# --- compaction only, 64x ----------------------------------------------------
@jax.jit
def loop_compact(state):
    def body(i, s):
        seam = _fake_seam(i, s)
        new_width = s.width - 1
        lm = _edge_fill(remove_seam(s.luma, seam), new_width)
        oc = remove_seam(s.origcol, seam)
        en = remove_seam(s.energy, seam)
        return s._replace(luma=lm, origcol=oc, width=new_width, energy=en)

    return _digest(jax.lax.fori_loop(0, N, body, state))


timeit("compact-3-buffers x64", loop_compact, states)


# --- strip recompute only, 64x ----------------------------------------------
@jax.jit
def loop_strip(state):
    def body(i, s):
        seam = _fake_seam(i, s)
        en = _recompute_strip(s, seam, 8, 0.0, 1.0, 1)
        return s._replace(energy=en, width=s.width - 1)

    return _digest(jax.lax.fori_loop(0, N, body, state))


timeit("strip-recompute x64", loop_strip, states)


# --- seam-indexed gather + vmap scatter only ---------------------------------
@jax.jit
def loop_vmap(state):
    def body(i, s):
        seam = _fake_seam(i, s)
        rows = jnp.arange(H)
        orig = s.origcol[rows, seam]
        vmap = s.vmap.at[rows, orig].set(i + 1)
        return s._replace(vmap=vmap, width=s.width - 1)

    return _digest(jax.lax.fori_loop(0, N, body, state))


timeit("gather+vmap-scatter x64", loop_vmap, states)


# --- same bookkeeping via one-hot masked ops (no gather/scatter) -------------
@jax.jit
def loop_vmap_onehot(state):
    col = jnp.arange(W, dtype=jnp.int32)[None, :]

    def body(i, s):
        seam = _fake_seam(i, s)
        hit = col == seam[:, None]
        orig = jnp.sum(jnp.where(hit, s.origcol, 0), axis=1)
        vmap = jnp.where(col == orig[:, None], i + 1, s.vmap)
        return s._replace(vmap=vmap, width=s.width - 1)

    return _digest(jax.lax.fori_loop(0, N, body, state))


timeit("one-hot bookkeeping x64", loop_vmap_onehot, states)


# --- end to end ---------------------------------------------------------------
@jax.jit
def carve(l):
    return _digest(carve_n_seams(l, N, 8, 0.0, 1.0, strip_update=True))


b = timeit("carve_n_seams x64 (production)", carve, lumas)
print(f"-> {H*W*N/b/1e6:.1f} Mpix/s")
