"""Attribute the config-5 (8K spatial) per-seam cost stage by stage.

Each stage loops inside ONE jitted shard_map with a data dependency so XLA
cannot hoist it; per-iteration time is DIFFERENTIAL ((t(kN) - t(N)) / ((k-1)N))
so the fixed tunnel dispatch cancels.  Run on the attached TPU:

    python scripts/profile_spatial.py [H W N]

Stages: full step / dp / dp+backtrack / record / apply / strip / carry-only
(the carry-only loop shuffles the 5 carried buffers through the fori without
real work — it measures the loop-carry glue the VERDICT flagged).
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    from dct_carver_tpu.utils.cache import enable_compilation_cache
    from dct_carver_tpu.parallel.mesh import make_mesh
    from dct_carver_tpu.parallel import spatial as sp
    from dct_carver_tpu.pallas.spatial_dp_kernel import (
        sharded_apply_rows, apply_supported)

    enable_compilation_cache()
    args = [int(a) for a in sys.argv[1:5]]
    H, W, N, K = (args + [4320, 7680, 32, sp.FRONTIER_BLOCK][len(args):])[:4]
    mesh = make_mesh(axis_name="x")
    nsh = mesh.shape["x"]
    Wl = W // nsh
    print(f"# {H}x{W}, {nsh} shard(s), K={K}, N={N}", file=sys.stderr)

    rng = np.random.default_rng(0)
    spec = P(None, "x")

    def mk_state():
        luma = rng.random((H, W), np.float32)
        st, _ = sp.spatial_make_state(luma, mesh=mesh)
        return jax.block_until_ready(st)

    states = [mk_state() for _ in range(3)]

    def shard_loop(body_factory, n):
        """body_factory(axis) -> fn(st6) -> st6; loops n times inside one
        shard_map."""
        def shard_fn(luma_l, origcol_l, vmap_l, E_l, width0):
            img_l = jnp.zeros((1, nsh), jnp.float32)
            st = (luma_l, img_l, origcol_l, vmap_l, E_l, width0[0])
            body = body_factory("x")
            st = jax.lax.fori_loop(0, n, lambda i, s: body(i, s), st)
            return st[0], st[2], st[3], st[4], st[5][None]

        f = jax.jit(shard_map(
            shard_fn, mesh=mesh,
            in_specs=(spec, spec, spec, spec, P("x")),
            out_specs=(spec, spec, spec, spec, P("x")),
            check_vma=False,
        ))
        rep = lambda x: jnp.broadcast_to(jnp.asarray(x, jnp.int32), (nsh,))

        def run(st):
            out = f(st.luma, st.origcol, st.vmap, st.energy, rep(st.width))
            np.asarray(out[4])
            return out
        return run

    def time_loop(body_factory, n, reps=2):
        run = shard_loop(body_factory, n)
        run(states[0])
        best = float("inf")
        for i in range(reps):
            t0 = time.perf_counter()
            run(states[(i + 1) % len(states)])
            best = min(best, time.perf_counter() - t0)
        return best

    def per_iter_ms(body_factory, k=3):
        tN = time_loop(body_factory, N)
        tkN = time_loop(body_factory, k * N)
        return (tkN - tN) / ((k - 1) * N) * 1e3

    def fake_seam(i, width):
        return jnp.broadcast_to((i * 37) % (width - 1), (H,)).astype(jnp.int32)

    # ---- stage bodies (each returns a new st with a data dep) ----
    def body_full(axis):
        def b(i, st):
            st2, _ = sp._spatial_seam_step(
                st, i + 1, 8, 0.0, 1.0, W, Wl, K, True, False, axis,
                use_pallas=True, dead_max=128)
            return st2
        return b

    def body_dp(axis):
        def b(i, st):
            luma_l, img_l, oc_l, vm_l, E_l, width = st
            ext_M = sp._sharded_dp(E_l, width, K, axis, use_pallas=True)
            E_l = E_l.at[0, 0].add(ext_M[-1, 0] * 1e-30)
            return (luma_l, img_l, oc_l, vm_l, E_l, width)
        return b

    def body_dp_bt(axis):
        def b(i, st):
            luma_l, img_l, oc_l, vm_l, E_l, width = st
            ext_M = sp._sharded_dp(E_l, width, K, axis, use_pallas=True)
            seam = sp._sharded_backtrack(ext_M, width, K, axis, Wl,
                                         use_pallas=True)
            E_l = E_l.at[0, 0].add(seam[0].astype(jnp.float32) * 1e-30)
            return (luma_l, img_l, oc_l, vm_l, E_l, width)
        return b

    def body_record(axis):
        def b(i, st):
            luma_l, img_l, oc_l, vm_l, E_l, width = st
            idx = jax.lax.axis_index(axis)
            lo = idx * Wl
            seam = fake_seam(i, width)
            li = seam - lo
            col_l = jnp.arange(Wl, dtype=jnp.int32)[None, :]
            hit = col_l == li[:, None]
            orig = jax.lax.psum(
                jnp.sum(jnp.where(hit, oc_l, 0), axis=1), axis)
            vm_l = jnp.where(col_l == (orig - lo)[:, None], i + 1, vm_l)
            return (luma_l, img_l, oc_l, vm_l, E_l, width)
        return b

    def body_apply(axis):
        def b(i, st):
            luma_l, img_l, oc_l, vm_l, E_l, width = st
            idx = jax.lax.axis_index(axis)
            lo = idx * Wl
            seam = fake_seam(i, width)
            width = width - 1
            incoming = sp._from_right(jnp.concatenate([
                luma_l[:, :1], E_l[:, :1],
                jax.lax.bitcast_convert_type(oc_l[:, :1], jnp.float32),
            ], axis=1), axis)
            col_l = jnp.arange(Wl, dtype=jnp.int32)[None, :]
            cand = []
            for c in (width, width - 1):
                lic = c - lo
                cand.append(jnp.sum(
                    jnp.where(col_l == lic, luma_l, 0.0), axis=1))
            v1, v2 = jax.lax.psum(jnp.stack(cand, axis=1), axis).T
            edge = jnp.where(seam == width, v2, v1)
            luma_l, oc_l, E_shift, _ = sharded_apply_rows(
                luma_l, oc_l, E_l, seam, edge, incoming, width, lo)
            return (luma_l, img_l, oc_l, vm_l, E_shift, width)
        return b

    def body_apply_kernel(axis):
        # kernel only: seam/edge/incoming are cheap fabrications — isolates
        # the 7-buffer blocked DMA from the XLA glue (takes/psum/ppermute)
        def b(i, st):
            luma_l, img_l, oc_l, vm_l, E_l, width = st
            idx = jax.lax.axis_index(axis)
            lo = idx * Wl
            seam = fake_seam(i, width)
            width = width - 1
            incoming = jnp.zeros((H, 3), jnp.float32)
            edge = jnp.full((H,), 0.5, jnp.float32) + E_l[0, 0] * 1e-30
            luma_l, oc_l, E_shift, _ = sharded_apply_rows(
                luma_l, oc_l, E_l, seam, edge, incoming, width, lo)
            return (luma_l, img_l, oc_l, vm_l, E_shift, width)
        return b

    def body_edge_extract(axis):
        # just the two dynamic column takes + psum the real apply glue does
        def b(i, st):
            luma_l, img_l, oc_l, vm_l, E_l, width = st
            idx = jax.lax.axis_index(axis)
            lo = idx * Wl
            width = width - 1
            cand = []
            for c in (width, width - 1):
                lic = c - lo
                ow = (lic >= 0) & (lic < Wl)
                cand.append(jnp.where(
                    ow, jnp.take(luma_l, jnp.clip(lic, 0, Wl - 1), axis=1),
                    0.0))
            v1, v2 = jax.lax.psum(jnp.stack(cand, axis=1), axis).T
            E_l = E_l.at[0, 0].add(v1[0] * 1e-30 + v2[0] * 1e-30)
            return (luma_l, img_l, oc_l, vm_l, E_l, width)
        return b

    def body_strip(axis):
        def b(i, st):
            luma_l, img_l, oc_l, vm_l, E_l, width = st
            seam = fake_seam(i, width)
            if sp._spatial_strip_pallas_ok(H, Wl, 8, 1):
                E2 = sp._sharded_strip_update_pallas(
                    luma_l, E_l, seam, 8, 0.0, 1.0, W, axis)
            else:
                E2 = sp._sharded_strip_update(
                    luma_l, E_l, seam, 8, 0.0, 1.0, W, axis)
            return (luma_l, img_l, oc_l, vm_l, E2, width - 1)
        return b

    def body_carry(axis):
        # shuffle all 5 carried buffers with a trivial op: measures the
        # fori-loop carry cost itself (buffer copies the loop forces)
        def b(i, st):
            luma_l, img_l, oc_l, vm_l, E_l, width = st
            return (luma_l + 0.0, img_l, oc_l + 0, vm_l + 0, E_l + 0.0,
                    width - 0)
        return b

    def body_noop(axis):
        def b(i, st):
            luma_l, img_l, oc_l, vm_l, E_l, width = st
            return (luma_l, img_l, oc_l, vm_l,
                    E_l.at[0, 0].add(1e-30), width)
        return b

    stages = [("full", body_full), ("dp", body_dp),
              ("dp+bt", body_dp_bt), ("record", body_record),
              ("apply", body_apply), ("applyK", body_apply_kernel),
              ("edgex", body_edge_extract), ("strip", body_strip),
              ("carry5", body_carry), ("noop", body_noop)]
    only = [s for s in sys.argv[5:]]
    if only:
        stages = [s for s in stages if s[0] in only]
    for name, bf in stages:
        try:
            ms = per_iter_ms(bf)
            print(f"{name:8s} {ms:7.3f} ms/seam", flush=True)
        except Exception as e:
            print(f"{name:8s} FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
