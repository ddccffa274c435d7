"""Batched (vmap) forms of the Pallas kernels — the custom_vmap rules must
route `jax.vmap` to the flattened single-kernel launches and match the
per-image results bitwise (VERDICT r2: the batch path, BASELINE config 4,
previously relied on the generic pallas batching rule that Mosaic rejects).

Interpreter mode on CPU like the other kernel tests; the same flattened
forms lower on real Mosaic (bench.py config 4 exercises them on hardware).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dct_carver_tpu.ops import dp
from dct_carver_tpu.ops.carve import _edge_fill, carve_n_seams
from dct_carver_tpu.pallas.dp_kernel import find_seam_pallas
from dct_carver_tpu.pallas.apply_kernel import apply_seam_pallas, new_edge_value
from dct_carver_tpu.pallas.strip_kernel import gather_slabs, scatter_strips, WIN


def test_vmap_find_seam_matches_scan(rng):
    B, H, W = 3, 16, 256
    E = jnp.asarray(rng.random((B, H, W)).astype(np.float32))
    widths = jnp.asarray([W, 200, 130], jnp.int32)
    got = jax.jit(jax.vmap(
        lambda e, w: find_seam_pallas(e, w, interpret=True)
    ))(E, widths)
    for i in range(B):
        ref = dp.backtrack(dp.cumulative_energy(dp.mask_energy(E[i], widths[i])))
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(ref))


def test_vmap_apply_matches_xla(rng):
    B, H, W = 3, 16, 256
    luma = jnp.asarray(rng.random((B, H, W)).astype(np.float32))
    E = jnp.asarray(rng.random((B, H, W)).astype(np.float32))
    oc = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32), (B, H, W))
    widths = jnp.asarray([W, 180, 140], jnp.int32)
    seams = jax.vmap(lambda e, w: find_seam_pallas(e, w, interpret=True))(
        E, widths)
    edge = jax.vmap(new_edge_value)(luma, seams, widths)
    lo, oo, eo = jax.jit(jax.vmap(
        lambda l, o, e, s, ed, w: apply_seam_pallas(
            l, o, e, s, ed, w, interpret=True)
    ))(luma, oc, E, seams, edge, widths)
    for i in range(B):
        ref_l = _edge_fill(dp.remove_seam(luma[i], seams[i]), widths[i] - 1)
        np.testing.assert_array_equal(np.asarray(lo[i]), np.asarray(ref_l))
        np.testing.assert_array_equal(
            np.asarray(oo[i]), np.asarray(dp.remove_seam(oc[i], seams[i])))
        np.testing.assert_array_equal(
            np.asarray(eo[i]), np.asarray(dp.remove_seam(E[i], seams[i])))


def test_vmap_gather_scatter_match_single(rng):
    B, nb, slab_rows, Wl, swb = 2, 4, 16, 384, 27
    Hp = nb * 8 + slab_rows - 8
    lp = jnp.asarray(rng.random((B, Hp, Wl)).astype(np.float32))
    bs = jnp.asarray([[0, 37, Wl - WIN, 100], [5, 64, 200, Wl - WIN]],
                     jnp.int32)
    got = jax.jit(jax.vmap(
        lambda l, b: gather_slabs(l, b, slab_rows, interpret=True)
    ))(lp, bs)
    for i in range(B):
        ref = gather_slabs(lp[i], bs[i], slab_rows, interpret=True)
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(ref))

    H, W = nb * 8, Wl
    E = jnp.asarray(rng.random((B, H, W)).astype(np.float32))
    strips = jnp.asarray(rng.random((B, nb, 8, WIN)).astype(np.float32))
    sb = jnp.asarray([[0, 113, W - swb, 50], [7, 0, 250, W - swb]], jnp.int32)
    got = jax.jit(jax.vmap(
        lambda e, s, b: scatter_strips(e, s, b, swb, interpret=True)
    ))(E, strips, sb)
    for i in range(B):
        ref = scatter_strips(E[i], strips[i], sb[i], swb, interpret=True)
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(ref))


def test_vmap_full_carve_production_config(rng):
    """The whole shipping config (pallas DP + apply + strip) under vmap must
    carve each image exactly as the per-image scan path does."""
    B, H, W, n_seams = 3, 16, 256, 4
    lumas = jnp.asarray(rng.random((B, H, W)).astype(np.float32))
    batched = jax.jit(jax.vmap(
        lambda l: carve_n_seams(l, n_seams, 8, 0.3, 0.8,
                                strip_update=True, use_pallas=True)
    ))(lumas)
    for i in range(B):
        ref = carve_n_seams(lumas[i], n_seams, 8, 0.3, 0.8,
                            strip_update=True, use_pallas=False)
        np.testing.assert_array_equal(
            np.asarray(batched.vmap[i]), np.asarray(ref.vmap))
        assert int(batched.width[i]) == W - n_seams
