"""Pallas strip gather/scatter kernels (interpreter mode on CPU) — bitwise."""

import numpy as np
import pytest

import jax.numpy as jnp

from dct_carver_tpu.ops.carve import (
    carve_n_seams, strip_pallas_ok, _strip_block_dims,
)
from dct_carver_tpu.pallas.strip_kernel import (
    gather_slabs, scatter_strips, strip_pallas_supported, WIN,
)


def test_gather_slabs_matches_slicing(rng):
    nb, slab_rows, Wl = 4, 16, 384
    lp = rng.random((nb * 8 + slab_rows - 8, Wl)).astype(np.float32)
    bs = np.array([0, 37, Wl - WIN, Wl - WIN + 100], dtype=np.int32)
    out = np.asarray(gather_slabs(jnp.asarray(lp), jnp.asarray(bs), slab_rows,
                                  interpret=True))
    assert out.shape == (nb, slab_rows, WIN)
    for b in range(nb):
        # valid lanes: [0, WIN - rem) — the rotation wraps the rest (unused;
        # callers only consume the first gwb <= 128 lanes)
        astart = min((bs[b] // 128) * 128, Wl - WIN)
        take = WIN - (bs[b] - astart)
        ref = lp[b * 8 : b * 8 + slab_rows, bs[b] : bs[b] + take]
        np.testing.assert_array_equal(out[b, :, :take], ref)


def test_scatter_strips_matches_update(rng):
    H, W, swb = 24, 384, 27
    nb = H // 8
    E = rng.random((H, W)).astype(np.float32)
    strips = rng.random((nb, 8, WIN)).astype(np.float32)
    bs = np.array([0, 113, W - swb], dtype=np.int32)
    got = np.asarray(scatter_strips(jnp.asarray(E), jnp.asarray(strips),
                                    jnp.asarray(bs), swb, interpret=True))
    ref = E.copy()
    for b in range(nb):
        ref[b * 8 : (b + 1) * 8, bs[b] : bs[b] + swb] = strips[b, :, :swb]
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("hw,blocksize",
                         [((16, 256), 4),   # packed, nb=1 (odd dummy tail)
                          ((24, 384), 8),   # packed, nb=1
                          ((48, 384), 8),   # packed, nb=2 (even pairs)
                          ((40, 512), 16)]) # packed n=16, nb=5 (odd tail)
def test_carve_strip_pallas_matches_xla(hw, blocksize, rng):
    """Full carve: Pallas strip path == XLA strip path == full recompute."""
    H, W = hw
    assert strip_pallas_ok(H, W, blocksize)
    img = rng.integers(0, 256, size=(H, W), dtype=np.uint8)
    luma = jnp.asarray(img.astype(np.float32) / 255.0)
    args = (luma, 5, blocksize, 0.3, 0.8)
    xla = carve_n_seams(*args, strip_update=True, use_pallas=False)
    pal = carve_n_seams(*args, strip_update=True, use_pallas=True)
    full = carve_n_seams(*args, strip_update=False, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(xla.vmap), np.asarray(pal.vmap))
    np.testing.assert_array_equal(np.asarray(xla.energy), np.asarray(pal.energy))
    np.testing.assert_array_equal(np.asarray(full.vmap), np.asarray(pal.vmap))


def test_strip_pallas_gate():
    assert strip_pallas_supported(1080, 1920)
    assert not strip_pallas_supported(1080, 128)   # W < 256
    assert not strip_pallas_supported(37, 256)     # H not row-block aligned
    assert strip_pallas_ok(1080, 1920, 16)
    # wide windows (big delta_x) overflow the 256-lane tile -> gated off
    assert not strip_pallas_ok(1080, 1920, 16, delta_x=5)
    swb, gwb = _strip_block_dims(16, 4)
    assert gwb <= 128


@pytest.mark.parametrize("n,R", [(8, 16), (16, 8)])
def test_strip_energy_kernel_matches_bands(rng, n, R):
    """The fused strip-energy kernel (interpret mode) must match the XLA
    energy_from_bands chains on the same slab values.  Interpret mode
    carries ~ulp LLVM-FMA noise (see test_energy_kernel.py); on TPU the
    shared chain emitter makes it bitwise (scripts/verify_strip_tpu.py)."""
    from dct_carver_tpu.ops.dct import energy_from_bands
    from dct_carver_tpu.pallas.strip_kernel import strip_energy_pallas
    from dct_carver_tpu.ops.carve import _strip_block_dims

    nb = 3
    slab_rows = -(-(R + n - 1) // 8) * 8
    swb, gwb = _strip_block_dims(n, 1, R)
    slabs = rng.random((nb, slab_rows, WIN)).astype(np.float32)

    got = np.asarray(strip_energy_pallas(
        jnp.asarray(slabs), n, 0.3, 0.8, R, interpret=True))
    assert got.shape == (nb, R, WIN)

    bands = np.stack(
        [slabs[:, rr : rr + n, :gwb] for rr in range(R)], axis=1
    )
    ref = np.asarray(energy_from_bands(
        jnp.asarray(bands.reshape(nb * R, n, gwb)), n, 0.3, 0.8
    )).reshape(nb, R, swb)
    np.testing.assert_allclose(got[:, :, :swb], ref, rtol=5e-5, atol=1e-7)


def test_strip_energy_kernel_vmap_flattens(rng):
    """jax.vmap over strip_energy_pallas must route to the flattened batch
    kernel and match per-image results."""
    import jax

    from dct_carver_tpu.pallas.strip_kernel import strip_energy_pallas

    B, nb, n, R = 2, 2, 8, 8
    slab_rows = -(-(R + n - 1) // 8) * 8
    slabs = rng.random((B, nb, slab_rows, WIN)).astype(np.float32)
    f = lambda s: strip_energy_pallas(s, n, 0.1, 0.9, R, interpret=True)
    got = np.asarray(jax.vmap(f)(jnp.asarray(slabs)))
    for b in range(B):
        np.testing.assert_array_equal(got[b], np.asarray(f(jnp.asarray(slabs[b]))))
