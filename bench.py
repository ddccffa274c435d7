"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.md): single-seam retargeting throughput in Mpix/s on one
chip — pixels of image processed per second of seam-carving, i.e.
(H * W * n_seams) / elapsed.  Target >= 100 Mpix/s per chip → vs_baseline =
value / 100.  Secondary configs are reported on stderr.

Run: python bench.py            (full: 1080p RGB, 8x8, 64 seams + extras)
     python bench.py --quick    (small shapes, for smoke testing)
"""

import json
import sys
import time

import numpy as np


def _time_carve(luma, n_seams, blocksize, strip_update=True, repeats=3):
    import jax
    from dct_carver_tpu.ops.carve import carve_n_seams

    def run():
        state = carve_n_seams(luma, n_seams, blocksize, 0.0, 1.0,
                              strip_update=strip_update)
        jax.block_until_ready(state)
        return state

    run()  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    h, w = luma.shape
    mpix_s = h * w * n_seams / best / 1e6
    return mpix_s, best


def main():
    quick = "--quick" in sys.argv
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    rng = np.random.default_rng(0)

    if quick:
        h, w, seams = 256, 384, 8
    else:
        h, w, seams = 1080, 1920, 64  # config 2: 1080p, 8x8 blocks

    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    from dct_carver_tpu.ops.energy import to_luma

    luma = jax.block_until_ready(to_luma(jnp.asarray(img)))

    headline, t = _time_carve(luma, seams, 8, strip_update=True)
    print(f"# {h}x{w} 8x8 strip-update: {headline:.1f} Mpix/s "
          f"({seams} seams in {t*1e3:.1f} ms)", file=sys.stderr)

    if not quick:
        try:
            full, tf = _time_carve(luma, 8, 8, strip_update=False, repeats=2)
            print(f"# {h}x{w} 8x8 full-recompute: {full:.1f} Mpix/s", file=sys.stderr)
        except Exception as e:  # secondary configs must not kill the headline
            print(f"# full-recompute bench failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "single_seam_retarget_throughput",
        "value": round(headline, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(headline / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
