"""Seam DP + carve-loop parity tests vs the NumPy oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dct_carver_tpu.oracle import reference as oracle
from dct_carver_tpu.ops import dp
from dct_carver_tpu.ops import carve as carve_ops


def test_cumulative_energy_bitwise(rng):
    E = rng.random((37, 53)).astype(np.float32)
    ref = oracle.cumulative_energy(E)
    got = np.asarray(dp.cumulative_energy(jnp.asarray(E)))
    np.testing.assert_array_equal(got, ref)


def test_backtrack_matches_oracle_with_ties(rng):
    # quantized energies force many exact ties — the tie conventions must match
    E = (rng.integers(0, 4, size=(40, 64)).astype(np.float32)) / 4.0
    M = oracle.cumulative_energy(E)
    ref = oracle.backtrack_seam(M)
    got = np.asarray(dp.backtrack(jnp.asarray(M)))
    np.testing.assert_array_equal(got, ref)


def test_find_seam_random(rng):
    for _ in range(5):
        E = rng.random((30, 41)).astype(np.float32)
        ref = oracle.find_seam(E)
        got = np.asarray(dp.find_seam(jnp.asarray(E)))
        np.testing.assert_array_equal(got, ref)


def test_remove_seam_matches(rng):
    arr = rng.random((20, 30)).astype(np.float32)
    seam = rng.integers(0, 30, size=20).astype(np.int32)
    ref = oracle._remove_seam(arr, seam)
    got = np.asarray(dp.remove_seam(jnp.asarray(arr), jnp.asarray(seam)))
    np.testing.assert_array_equal(got[:, :29], ref)


@pytest.mark.parametrize("blocksize", [2, 4, 8, 16])
def test_carve_seams_parity_gray(blocksize, make_image):
    """Seam-for-seam vmap parity, JAX x64 vs oracle, grayscale."""
    img = make_image(40, 48)
    n = 6
    _, ref_vmap, _ = oracle.carve_seams(img, n, blocksize, 0.3, 0.9)
    with jax.enable_x64(True):
        luma = jnp.asarray(oracle.luma_bt709(img), jnp.float64)
        state = carve_ops.carve_n_seams(
            luma, n, blocksize, 0.3, 0.9, strip_update=False
        )
    np.testing.assert_array_equal(np.asarray(state.vmap), ref_vmap)
    assert int(state.width) == 48 - n


def test_carve_seams_parity_rgb(make_image):
    img = make_image(32, 40, c=3)
    n = 5
    ref_out, ref_vmap, _ = oracle.carve_seams(img, n, 8, 0.0, 1.0)
    with jax.enable_x64(True):
        luma = jnp.asarray(oracle.luma_bt709(img), jnp.float64)
        state = carve_ops.carve_n_seams(luma, n, 8, 0.0, 1.0, strip_update=False)
        out = carve_ops.reconstruct_removed(jnp.asarray(img), state.vmap, n)
    np.testing.assert_array_equal(np.asarray(state.vmap), ref_vmap)
    np.testing.assert_array_equal(np.asarray(out), ref_out)


@pytest.mark.parametrize("blocksize", [2, 4, 8, 16])
def test_strip_update_equals_full(blocksize, make_image):
    """Strip-update energy path must match the full-recompute path exactly."""
    img = make_image(48, 64, c=3)
    luma = jnp.asarray(np.asarray(oracle.luma_bt709(img), np.float32))
    n = 10
    full = carve_ops.carve_n_seams(luma, n, blocksize, 0.4, 0.8, strip_update=False)
    strip = carve_ops.carve_n_seams(luma, n, blocksize, 0.4, 0.8, strip_update=True)
    np.testing.assert_array_equal(np.asarray(full.vmap), np.asarray(strip.vmap))
    W = 64 - n
    np.testing.assert_array_equal(
        np.asarray(full.energy)[:, :W], np.asarray(strip.energy)[:, :W]
    )
    np.testing.assert_array_equal(
        np.asarray(full.luma), np.asarray(strip.luma)
    )


def test_enlarge_parity(make_image):
    img = make_image(24, 30, c=3)
    n = 4
    ref_out, ref_vmap = oracle.insert_seams(img, n, 8, 0.2, 0.7)
    with jax.enable_x64(True):
        luma = jnp.asarray(oracle.luma_bt709(img), jnp.float64)
        state = carve_ops.carve_n_seams(luma, n, 8, 0.2, 0.7, strip_update=False)
        out = carve_ops.reconstruct_enlarged(jnp.asarray(img), state.vmap, n)
    np.testing.assert_array_equal(np.asarray(state.vmap), ref_vmap)
    np.testing.assert_array_equal(np.asarray(out), ref_out)


def test_f32_pipeline_runs(make_image):
    """Default f32 path: sane output, no parity assertion (near-tie flips allowed)."""
    img = make_image(64, 80, c=3)
    from dct_carver_tpu.ops.energy import to_luma
    luma = to_luma(jnp.asarray(img))
    state = carve_ops.carve_n_seams(luma, 16, 8, 0.1, 0.9)
    vm = np.asarray(state.vmap)
    # exactly one pixel per row per seam
    for k in range(1, 17):
        assert ((vm == k).sum(axis=1) == 1).all()
    # seam connectivity: adjacent rows differ by <= 1 in ORIGINAL coords...
    # (original-coord columns of one seam can differ by more after compaction,
    # so check count only)
    assert int(state.width) == 80 - 16
