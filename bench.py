"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.md): single-seam retargeting throughput in Mpix/s on one
chip — pixels of image processed per second of seam-carving, i.e.
(H * W * n_seams) / elapsed.  Target >= 100 Mpix/s per chip → vs_baseline =
value / 100.

The DEFAULT run also emits, on stderr (one line each, driver-tail friendly):
  * a per-seam device-time stage budget (DP / apply / strip) at 1080p;
  * BASELINE.md configs 1-4 (config 4 = vmap-over-Pallas on real Mosaic);
  * config 5's spatial path (collectives ride a 1-device mesh here; the
    multi-device exchange is validated by dryrun_multichip / tests).

Run: python bench.py              headline + budget + configs 1-5
     python bench.py --quick      small shapes, smoke test
     python bench.py --headline   headline only (old default behavior)
     python bench.py --config N   BASELINE config N in {1,2,3,4,5}
"""

import json
import os
import sys
import time

import numpy as np

# 8 virtual CPU host devices alongside the TPU: config 5 compiles its seam
# step for an 8-way CPU mesh to MEASURE the collective count in the HLO
# (the 1-chip TPU mesh degenerates to zero collectives)
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()


def _mk_lumas(rng, h, w, k=4, channels=3):
    import jax
    import jax.numpy as jnp
    from dct_carver_tpu.ops.energy import to_luma

    to_luma_j = jax.jit(to_luma)
    shape = (h, w) if channels is None else (h, w, channels)
    return [
        jax.block_until_ready(to_luma_j(jnp.asarray(
            rng.integers(0, 256, size=shape, dtype=np.uint8)
        )))
        for _ in range(k)
    ]


def _time_carve(lumas, n_seams, blocksize, strip_update=True, repeats=3,
                use_pallas=None):
    """lumas: list of distinct same-shape planes — repeated identical calls
    can be served from a cache by the device tunnel, so every timed run gets
    a different input."""
    from dct_carver_tpu.ops.carve import carve_n_seams

    def run(x):
        state = carve_n_seams(x, n_seams, blocksize, 0.0, 1.0,
                              strip_update=strip_update, use_pallas=use_pallas)
        # block_until_ready does not actually drain the axon TPU tunnel;
        # a scalar readback does
        int(state.width)
        return state

    run(lumas[0])  # compile
    best = float("inf")
    for i in range(repeats):
        x = lumas[(i + 1) % len(lumas)]
        t0 = time.perf_counter()
        run(x)
        best = min(best, time.perf_counter() - t0)
    h, w = lumas[0].shape
    mpix_s = h * w * n_seams / best / 1e6
    return mpix_s, best


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_config_1(rng):
    """512x512 gray, 8x8, 64 vertical seams + native CPU reference time."""
    lumas = _mk_lumas(rng, 512, 512, channels=None)
    v, t = _time_carve(lumas, 64, 8)
    line = f"# config1 512x512 gray 64 seams: {v:.1f} Mpix/s ({t*1e3:.1f} ms)"
    try:
        from dct_carver_tpu.utils.native import carve_native

        luma64 = np.asarray(lumas[0], np.float64)
        t0 = time.perf_counter()
        carve_native(luma64, 64, 8, 0.0, 1.0)
        tc = time.perf_counter() - t0
        line += (f"; native 1-core CPU ref {512*512*64/tc/1e6:.1f} Mpix/s "
                 f"-> TPU {tc/t:.0f}x")
    except Exception as e:
        line += f"; native ref unavailable: {e}"
    _log(line)
    return v


def bench_config_2(rng):
    """1080p RGB, 8x8, 20% width reduction (384 seams)."""
    lumas = _mk_lumas(rng, 1080, 1920, k=3)
    v, t = _time_carve(lumas, 384, 8, repeats=2)
    _log(f"# config2 1080p 20% width (384 seams): {v:.1f} Mpix/s ({t:.2f} s)")
    return v


def bench_config_3(rng):
    """4K, 16x16 blocks, bidirectional (vertical + horizontal passes)."""
    import jax
    import jax.numpy as jnp
    from dct_carver_tpu.ops.carve import carve_n_seams

    h, w, n = 2160, 3840, 32
    lumas = _mk_lumas(rng, h, w, k=2)

    def run(x):
        st = carve_n_seams(x, n, 16, 0.0, 1.0)
        # horizontal pass on the transposed result (liblqr order: width first)
        st2 = carve_n_seams(jnp.swapaxes(st.luma, 0, 1)[:, : h], n, 16, 0.0, 1.0)
        int(st2.width)

    run(lumas[0])
    t0 = time.perf_counter()
    run(lumas[1])
    t = time.perf_counter() - t0
    v = h * w * 2 * n / t / 1e6
    _log(f"# config3 4K 16x16 bidirectional (2x{n} seams): {v:.1f} Mpix/s "
         f"({t:.2f} s)")
    return v


def bench_config_4(rng):
    """Batch of 1-Mpix images, 128 seams each, sharded over the mesh —
    exercises the flattened-batch (custom_vmap) Pallas kernels on Mosaic.
    (Batch scaled to fit one chip's HBM; BASELINE's 1024 images assume a pod.)"""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dct_carver_tpu.parallel.mesh import carve_batch, make_mesh

    B, h, w = 16, 1024, 1024
    mesh = make_mesh()
    sharding = NamedSharding(mesh, P("data"))
    # pre-stage distinct batches on device: a 50 MB host->device push over
    # the tunnel costs 1-5 s with high variance and is NOT carve throughput
    batches = [
        jax.block_until_ready(jax.device_put(
            jnp.asarray(rng.integers(0, 256, size=(B, h, w, 3),
                                     dtype=np.uint8)), sharding))
        for _ in range(2)
    ]
    _, vm = carve_batch(batches[0], 128, mesh=mesh, reconstruct=False)
    np.asarray(vm[0, 0, 0])  # block: the warmup must fully drain
    best = float("inf")
    for i in range(2):
        t0 = time.perf_counter()
        _, vm = carve_batch(batches[(i + 1) % 2], 128, mesh=mesh,
                            reconstruct=False)
        np.asarray(vm[0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    v = B * h * w * 128 / best / 1e6
    _log(f"# config4 batch {B}x1Mpix, 128 seams: {v:.1f} Mpix/s ({best:.2f} s) "
         f"over {len(jax.devices())} device(s)")
    return v


def bench_config_5(rng):
    """Spatially-sharded single image (BASELINE config 5: 8K panorama).
    On one chip the mesh is 1-wide (collectives degenerate); the bench
    records throughput + the collective budget per seam of the design."""
    import jax
    import jax.numpy as jnp
    from dct_carver_tpu.parallel.mesh import make_mesh
    from dct_carver_tpu.parallel.spatial import (
        spatial_carve_n_seams, collectives_per_seam,
    )

    h, w, n = 4320, 7680, 64
    mesh = make_mesh(axis_name="x")
    nsh = mesh.shape["x"]
    lumas = _mk_lumas(rng, h, w, k=2)

    def run(x, nn):
        r = spatial_carve_n_seams(x, nn, blocksize=8, mesh=mesh)
        int(r.width)

    run(lumas[0], n)
    t0 = time.perf_counter()
    run(lumas[1], n)
    t = time.perf_counter() - t0
    v = h * w * n / t / 1e6
    # marginal per-seam cost (fixed init-energy + readback amortized out)
    run(lumas[0], 2 * n)
    t0 = time.perf_counter()
    run(lumas[1], 2 * n)
    t2 = time.perf_counter() - t0
    marginal = (t2 - t) / n * 1e3
    coll = collectives_per_seam(h, fused_apply=True)  # the path that runs
    # measured (not computed) collective count: compile one unrolled seam
    # step for an 8-way CPU mesh and count collective ops in the HLO.  The
    # XLA-form step is measured at the full 8K shape; the kernel-form step
    # (fused apply: -2 ppermutes) is HLO-measured at test shapes in
    # tests/test_spatial.py (its plain-jax twins compile too slowly
    # unrolled at 8K on the host).
    try:
        from jax.sharding import Mesh
        from dct_carver_tpu.parallel.spatial import (
            measure_collectives_per_seam,
        )

        cpu8 = jax.devices("cpu")[:8]
        # keep the persistent cache out of the CPU-mesh compile: AOT
        # results cached on a different host spew feature-mismatch errors
        jax.config.update("jax_enable_compilation_cache", False)
        try:
            m = measure_collectives_per_seam(
                h, w, Mesh(np.array(cpu8), ("x",)))
        finally:
            jax.config.update("jax_enable_compilation_cache", True)
        meas = (f"measured {m['total']}/seam in 8-way HLO (XLA form; "
                f"{', '.join(f'{k}={v2}' for k, v2 in m['by_op'].items())})")
    except Exception as e:
        meas = f"HLO measurement failed: {type(e).__name__}"
    _log(f"# config5 8K spatial ({nsh} shard(s), {n} seams): {v:.1f} Mpix/s "
         f"({t:.2f} s, marginal {marginal:.1f} ms/seam); {meas}; "
         f"kernel-form {coll}/seam (vs {3*h} per-row design)")
    return v


def bench_stage_budget(rng, lumas):
    """Per-seam device-time split of the production 1080p carve: DP (find
    seam), apply (fused 3-buffer compaction), strip (energy update).  Each
    stage loops inside ONE jit with a data dependency so XLA cannot hoist
    it; per-iteration time is DIFFERENTIAL — (t(2N) - t(N)) / N — so the
    fixed per-dispatch tunnel/readback latency (~20-40 ms, comparable to a
    whole 64-seam carve) cancels instead of inflating every stage."""
    import jax
    import jax.numpy as jnp
    from dct_carver_tpu.ops.carve import (
        make_state, full_energy_map, _recompute_strip_pallas, strip_pallas_ok,
        _recompute_strip,
    )
    from dct_carver_tpu.pallas.dp_kernel import find_seam_pallas
    from dct_carver_tpu.pallas.apply_kernel import (
        apply_seam_pallas, new_edge_value,
    )

    import functools

    H, W = lumas[0].shape
    N = 64
    use_pallas_strip = strip_pallas_ok(H, W, 8, 1)

    @jax.jit
    def prep(luma):
        s = make_state(luma)
        return s._replace(energy=full_energy_map(luma, 8, 0.0, 1.0))

    states = [jax.block_until_ready(prep(l)) for l in lumas[:3]]

    def time_loop(fn, n, reps=3):
        jfn = jax.jit(functools.partial(fn, n))
        jfn(states[0])
        best = float("inf")
        for i in range(reps):
            s = states[(i + 1) % len(states)]
            t0 = time.perf_counter()
            out = jfn(s)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best

    def per_iter_ms(fn):
        # 4N-vs-N differential: the ~25 ms fixed tunnel dispatch has +-few-ms
        # jitter, which swamps sub-0.1 ms stages at a 2N baseline
        return (time_loop(fn, 4 * N) - time_loop(fn, N)) / (3 * N) * 1e3

    def fake_seam(i, s):
        return jnp.broadcast_to((i * 37) % (s.width - 1), (H,)).astype(jnp.int32)

    def loop_dp(n, state):
        def body(i, carry):
            e, acc = carry
            seam = find_seam_pallas(e, state.width)
            e = e.at[0, :].add(seam[0].astype(jnp.float32) * 1e-30)
            return (e, acc + seam[0])
        _, acc = jax.lax.fori_loop(0, n, body, (state.energy, jnp.int32(0)))
        return acc

    def loop_apply(n, state):
        def body(i, s):
            seam = fake_seam(i, s)
            edge = new_edge_value(s.luma, seam, s.width)
            lm, oc, en = apply_seam_pallas(s.luma, s.origcol, s.energy, seam,
                                           edge, s.width)
            return s._replace(luma=lm, origcol=oc, energy=en,
                              width=s.width - 1)
        s = jax.lax.fori_loop(0, n, body, state)
        return s.luma[0, 0] + s.energy[0, 0]

    def loop_strip(n, state):
        def body(i, s):
            seam = fake_seam(i, s)
            rec = (_recompute_strip_pallas if use_pallas_strip
                   else _recompute_strip)
            en = rec(s, seam, 8, 0.0, 1.0, 1)
            return s._replace(energy=en, width=s.width - 1)
        s = jax.lax.fori_loop(0, n, body, state)
        return s.energy[0, 0]

    dp = per_iter_ms(loop_dp)
    ap = per_iter_ms(loop_apply)
    st = per_iter_ms(loop_strip)
    return dp, ap, st


def main():
    quick = "--quick" in sys.argv
    headline_only = "--headline" in sys.argv
    cfg = None
    if "--config" in sys.argv:
        cfg = int(sys.argv[sys.argv.index("--config") + 1])
    import jax
    from dct_carver_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    _log(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')} "
         f"x{len(jax.devices())}")

    rng = np.random.default_rng(0)

    if cfg is not None:
        fn = {1: bench_config_1, 2: bench_config_2, 3: bench_config_3,
              4: bench_config_4, 5: bench_config_5}.get(cfg)
        if fn is None:
            _log(f"# unknown config {cfg}")
            return
        v = fn(rng)
        print(json.dumps({
            "metric": f"config{cfg}_throughput", "value": round(v, 2),
            "unit": "Mpix/s", "vs_baseline": round(v / 100.0, 3),
        }))
        return

    if quick:
        h, w, seams = 256, 384, 8
    else:
        h, w, seams = 1080, 1920, 64  # config 2 shape, 8x8 blocks

    # best-of-6 with SEVEN distinct inputs: the fixed tunnel dispatch
    # (~25-40 ms) is a large, noisy fraction of a 64-seam 1080p carve, and
    # every timed draw must be a fresh input (repeated identical calls can
    # be served from a tunnel-side cache — _time_carve's own rule)
    lumas = _mk_lumas(rng, h, w, k=7)
    headline, t = _time_carve(lumas, seams, 8, strip_update=True, repeats=6)
    _log(f"# headline {h}x{w} 8x8 strip-update: {headline:.1f} Mpix/s "
         f"({seams} seams in {t*1e3:.1f} ms, {t/seams*1e3:.3f} ms/seam)")

    if not quick and not headline_only:
        try:
            # dispatch-overhead check: same carve at 2x seams — if per-seam
            # time falls toward the stage-budget sum, the 64-seam headline's
            # gap is fixed tunnel dispatch amortized over seams (ROADMAP)
            _, t2 = _time_carve(lumas, 2 * seams, 8, strip_update=True,
                                repeats=2)
            _log(f"# dispatch check: {2*seams} seams in {t2*1e3:.1f} ms -> "
                 f"{t2/(2*seams)*1e3:.3f} ms/seam (vs {t/seams*1e3:.3f} at "
                 f"{seams}; fixed overhead ~{(2*t - t2)*1e3:.0f} ms)")
        except Exception as e:
            _log(f"# dispatch check failed: {e}")
        try:
            dp, ap, st = bench_stage_budget(rng, lumas)
            _log(f"# stage budget per seam: dp={dp:.3f} ms apply={ap:.3f} ms "
                 f"strip={st:.3f} ms (sum {dp+ap+st:.3f} vs "
                 f"e2e {t/seams*1e3:.3f})")
        except Exception as e:
            _log(f"# stage budget failed: {e}")
        for name, fn in [("config1", bench_config_1), ("config2", bench_config_2),
                         ("config3", bench_config_3), ("config4", bench_config_4),
                         ("config5", bench_config_5)]:
            try:
                fn(rng)
            except Exception as e:  # secondary configs must not kill the headline
                _log(f"# {name} bench failed: {type(e).__name__}: "
                     f"{str(e).splitlines()[0][:120]}")

    print(json.dumps({
        "metric": "single_seam_retarget_throughput",
        "value": round(headline, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(headline / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
