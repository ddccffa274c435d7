"""TPU verification of the Pallas strip path: bitwise parity + speed."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from dct_carver_tpu.ops.carve import carve_n_seams

H, W, N = 1080, 1920, 64
rng = np.random.default_rng(0)
lumas = [jnp.asarray(rng.random((H, W), dtype=np.float32)) for _ in range(3)]


def run(luma, **kw):
    st = carve_n_seams(luma, N, 8, 0.3, 0.8, strip_update=True, **kw)
    int(st.width)
    return st


def bench(name, **kw):
    run(lumas[0], **kw)  # compile
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        st = run(lumas[(i + 1) % 3], **kw)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:32s} {best*1e3:7.1f} ms  {H*W*N/best/1e6:7.1f} Mpix/s")
    return st


new = bench("pallas dp + pallas strip", use_pallas=True)

# parity: force the XLA strip path by monkeypatching the gate
import dct_carver_tpu.ops.carve as carve_mod

orig_gate = carve_mod.strip_pallas_ok
carve_mod.strip_pallas_ok = lambda *a, **k: False
carve_mod.carve_n_seams.clear_cache()
old = bench("pallas dp + XLA strip", use_pallas=True)
carve_mod.strip_pallas_ok = orig_gate

vm_new, vm_old = np.asarray(new.vmap), np.asarray(old.vmap)
e_new, e_old = np.asarray(new.energy), np.asarray(old.energy)
assert (vm_new == vm_old).all(), "vmap mismatch!"
wid = int(old.width)
assert (e_new[:, :wid] == e_old[:, :wid]).all(), "energy mismatch!"
print("PARITY OK (vmap + live energy bitwise equal)")

# n=16 chains (255 atoms) through the fused strip-energy kernel vs XLA strip
H2, W2, N2 = 512, 1024, 8
lumas2 = [jnp.asarray(rng.random((H2, W2), dtype=np.float32)) for _ in range(2)]


def run16(luma, **kw):
    st = carve_n_seams(luma, N2, 16, 0.3, 0.8, strip_update=True, **kw)
    int(st.width)
    return st


new16 = run16(lumas2[0], use_pallas=True)
carve_mod.strip_pallas_ok = lambda *a, **k: False
carve_mod.carve_n_seams.clear_cache()
old16 = run16(lumas2[0], use_pallas=True)
carve_mod.strip_pallas_ok = orig_gate
assert (np.asarray(new16.vmap) == np.asarray(old16.vmap)).all(), "n16 vmap!"
w16 = int(old16.width)
assert (np.asarray(new16.energy)[:, :w16]
        == np.asarray(old16.energy)[:, :w16]).all(), "n16 energy!"
print("PARITY OK n=16 (fused strip-energy chains bitwise equal)")
