"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.md): single-seam retargeting throughput in Mpix/s on one
chip — pixels of image processed per second of seam-carving, i.e.
(H * W * n_seams) / elapsed.  Target >= 100 Mpix/s per chip → vs_baseline =
value / 100.  Secondary configs are reported on stderr.

Run: python bench.py              headline: 1080p RGB, 8x8, 64 seams + extras
     python bench.py --quick      small shapes, smoke test
     python bench.py --config N   BASELINE config N in {1,2,3,4}
                                  (5 = spatial multi-host needs >1 host)
"""

import json
import sys
import time

import numpy as np


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
    _log(f"# config1 512x512 gray 64 seams: {v:.1f} Mpix/s ({t*1e3:.1f} ms)")
    try:
        from dct_carver_tpu.utils.native import carve_native

        luma64 = np.asarray(lumas[0], np.float64)
        t0 = time.perf_counter()
        carve_native(luma64, 64, 8, 0.0, 1.0)
        tc = time.perf_counter() - t0
        _log(f"# config1 native single-core CPU reference: "
             f"{512*512*64/tc/1e6:.1f} Mpix/s ({tc:.2f} s) — TPU speedup "
             f"{tc/t:.0f}x")
    except Exception as e:
        _log(f"# native reference unavailable: {e}")
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
    _log(f"# config3 4K 16x16 bidirectional (2x{n} seams): {v:.1f} Mpix/s ({t:.2f} s)")
    return v


def bench_config_4(rng):
    """Batch of 1-Mpix images, 128 seams each, sharded over the mesh.
    (Batch scaled to fit one chip's HBM; BASELINE's 1024 images assume a pod.)"""
    import jax
    from dct_carver_tpu.parallel.mesh import carve_batch

    B, h, w = 16, 1024, 1024
    imgs = rng.integers(0, 256, size=(B, h, w, 3), dtype=np.uint8)
    _, vm = carve_batch(imgs, 128, reconstruct=False)  # compile + run
    np.asarray(vm[0, 0, 0])  # block: the warmup must fully drain
    t0 = time.perf_counter()
    _, vm = carve_batch(imgs, 128, reconstruct=False)
    np.asarray(vm[0, 0, 0])
    t = time.perf_counter() - t0
    v = B * h * w * 128 / t / 1e6
    _log(f"# config4 batch {B}x1Mpix, 128 seams: {v:.1f} Mpix/s ({t:.2f} s) "
         f"over {len(jax.devices())} device(s)")
    return v


def main():
    quick = "--quick" in sys.argv
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
              4: bench_config_4}.get(cfg)
        if fn is None:
            _log(f"# config {cfg} not runnable here (5 needs multiple hosts)")
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

    lumas = _mk_lumas(rng, h, w)
    headline, t = _time_carve(lumas, seams, 8, strip_update=True)
    _log(f"# {h}x{w} 8x8 strip-update: {headline:.1f} Mpix/s "
         f"({seams} seams in {t*1e3:.1f} ms)")

    if not quick:
        for label, kw in [
            ("full-recompute", dict(strip_update=False, n=8)),
            ("pallas-dp", dict(use_pallas=True, n=seams)),
            ("scan-dp", dict(use_pallas=False, n=seams)),
        ]:
            try:
                n = kw.pop("n")
                v, tt = _time_carve(lumas, n, 8, repeats=2, **kw)
                _log(f"# {h}x{w} 8x8 {label}: {v:.1f} Mpix/s "
                     f"({n} seams in {tt*1e3:.1f} ms)")
            except Exception as e:  # secondary configs must not kill the headline
                _log(f"# {label} bench failed: {e}")

    print(json.dumps({
        "metric": "single_seam_retarget_throughput",
        "value": round(headline, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(headline / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
