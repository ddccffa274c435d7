"""Attribute the config-4 (batch 16x1Mpix) per-batch-seam cost by stage.

Differential timing like profile_spatial.py; stages run vmapped over the
batch exactly as ops.carve._one_seam does under jax.vmap.

    python scripts/profile_batch.py [B H W N]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from dct_carver_tpu.utils.cache import enable_compilation_cache
    from dct_carver_tpu.ops.carve import (
        make_state, full_energy_map, _recompute_strip_pallas, strip_pallas_ok,
        _one_seam)
    from dct_carver_tpu.pallas.dp_kernel import find_seam_pallas
    from dct_carver_tpu.pallas.apply_kernel import (apply_seam_pallas,
                                                    new_edge_value)

    enable_compilation_cache()
    args = [int(a) for a in sys.argv[1:5]]
    B, H, W, N = (args + [16, 1024, 1024, 32][len(args):])[:4]
    print(f"# batch {B}x{H}x{W}, N={N}", file=sys.stderr)
    rng = np.random.default_rng(0)

    @jax.jit
    def prep(luma):
        s = make_state(luma)
        return s._replace(energy=full_energy_map(luma, 8, 0.0, 1.0))

    def mk():
        lumas = jnp.asarray(rng.random((B, H, W), np.float32))
        return jax.block_until_ready(jax.vmap(prep)(lumas))

    states = [mk() for _ in range(3)]

    def time_loop(body, n, reps=2):
        @jax.jit
        def f(st):
            return jax.lax.fori_loop(0, n, body, st)

        def run(st):
            out = f(st)
            np.asarray(out.energy[0, 0, 0])
            return out
        run(states[0])
        best = float("inf")
        for i in range(reps):
            t0 = time.perf_counter()
            run(states[(i + 1) % len(states)])
            best = min(best, time.perf_counter() - t0)
        return best

    def per_iter_ms(body, k=3):
        tN = time_loop(body, N)
        tkN = time_loop(body, k * N)
        return (tkN - tN) / ((k - 1) * N) * 1e3

    def fake_seams(i, width):
        # width (B,) i32 -> (B, H) fake seams with a data dependency
        return jnp.broadcast_to(
            ((i * 37) % (width - 1))[:, None], (width.shape[0], H)
        ).astype(jnp.int32)

    def body_full(i, st):
        return jax.vmap(
            lambda s: _one_seam(s, (i + 1).astype(jnp.int32), 8, 0.0, 1.0,
                                True, True)
        )(st)

    def body_dp(i, st):
        seams = jax.vmap(find_seam_pallas)(st.energy, st.width)
        e = st.energy.at[:, 0, 0].add(seams[:, 0].astype(jnp.float32) * 1e-30)
        return st._replace(energy=e)

    def body_apply(i, st):
        seams = fake_seams(i, st.width)

        def ap(s, seam):
            edge = new_edge_value(s.luma, seam, s.width)
            lm, oc, en = apply_seam_pallas(s.luma, s.origcol, s.energy, seam,
                                           edge, s.width)
            return s._replace(luma=lm, origcol=oc, energy=en,
                              width=s.width - 1)
        return jax.vmap(ap)(st, seams)

    def body_strip(i, st):
        seams = fake_seams(i, st.width)

        def rec(s, seam):
            en = _recompute_strip_pallas(s, seam, 8, 0.0, 1.0, 1)
            return s._replace(energy=en, width=s.width - 1)
        return jax.vmap(rec)(st, seams)

    def body_strip_fused(i, st):
        # as in the real loop: E_shift comes from the apply kernel for free
        seams = fake_seams(i, st.width)

        def rec(s, seam):
            en = _recompute_strip_pallas(s, seam, 8, 0.0, 1.0, 1,
                                         e_shift=s.energy)
            return s._replace(energy=en, width=s.width - 1)
        return jax.vmap(rec)(st, seams)

    def body_record(i, st):
        seams = fake_seams(i, st.width)

        def r1(s, seam):
            col = jnp.arange(W, dtype=jnp.int32)[None, :]
            hit = col == seam[:, None]
            orig = jnp.sum(jnp.where(hit, s.origcol, 0), axis=1)
            vmap = jnp.where(col == orig[:, None], i + 1, s.vmap)
            return s._replace(vmap=vmap)
        return jax.vmap(r1)(st, seams)

    assert strip_pallas_ok(H, W, 8, 1)
    stages = [("full", body_full), ("dp", body_dp), ("apply", body_apply),
              ("strip", body_strip), ("stripF", body_strip_fused),
              ("record", body_record)]
    only = sys.argv[5:]
    if only:
        stages = [s for s in stages if s[0] in only]
    for name, body in stages:
        try:
            ms = per_iter_ms(body)
            print(f"{name:8s} {ms:7.3f} ms/batch-seam", flush=True)
        except Exception as e:
            print(f"{name:8s} FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
