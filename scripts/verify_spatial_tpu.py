"""TPU verification of the spatial Pallas kernels: bitwise parity + speed."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from dct_carver_tpu.utils.cache import enable_compilation_cache
from dct_carver_tpu.parallel.mesh import make_mesh
from dct_carver_tpu.parallel.spatial import spatial_carve_n_seams

enable_compilation_cache()

h, w, n = 4320, 7680, 16
mesh = make_mesh(axis_name="x")
rng = np.random.default_rng(0)
lumas = [jnp.asarray(rng.random((h, w), dtype=np.float32)) for _ in range(2)]


def bench(name, **kw):
    def run(x):
        r = spatial_carve_n_seams(x, n, blocksize=8, mesh=mesh, **kw)
        int(r.width)
        return r
    run(lumas[0])
    best, res = float("inf"), None
    for i in range(2):
        t0 = time.perf_counter()
        res = run(lumas[(i + 1) % 2])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:8.1f} ms  {h*w*n/best/1e6:7.1f} Mpix/s "
          f"({best/n*1e3:.2f} ms/seam)", flush=True)
    return res


pal = bench("pallas block DP + seg walk", use_pallas=True)
scan = bench("scan DP + scalar walk", use_pallas=False)
assert (np.asarray(pal.vmap) == np.asarray(scan.vmap)).all(), "vmap mismatch!"
print("PARITY OK (spatial kernels bitwise equal to scan forms on TPU)")
