"""Pallas DP kernels (interpreter mode on CPU) vs the scan path — bitwise."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dct_carver_tpu.ops import dp
from dct_carver_tpu.pallas.dp_kernel import (
    dp_forward, dp_backtrack, find_seam_pallas, pallas_supported,
)


def _masked_find_seam(E, width):
    return dp.backtrack(dp.cumulative_energy(dp.mask_energy(E, width)))


@pytest.mark.parametrize("hw", [(16, 128), (40, 256)])
def test_dp_forward_matches_scan(hw, rng):
    H, W = hw
    E = rng.random((H, W)).astype(np.float32)
    width = jnp.int32(W)
    parents, mlast = dp_forward(jnp.asarray(E), width, interpret=True)
    M = dp.cumulative_energy(dp.mask_energy(jnp.asarray(E), width))
    np.testing.assert_array_equal(np.asarray(mlast)[0], np.asarray(M)[-1])


@pytest.mark.parametrize("width_frac", [1.0, 0.6])
def test_find_seam_pallas_matches(width_frac, rng):
    H, W = 32, 256
    E = rng.random((H, W)).astype(np.float32)
    width = jnp.int32(int(W * width_frac))
    ref = _masked_find_seam(jnp.asarray(E), width)
    got = find_seam_pallas(jnp.asarray(E), width, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_find_seam_pallas_ties(rng):
    """Quantized energies force exact ties; tie rules must match bitwise."""
    H, W = 24, 128
    E = (rng.integers(0, 3, size=(H, W)).astype(np.float32)) / 3.0
    width = jnp.int32(W)
    ref = _masked_find_seam(jnp.asarray(E), width)
    got = find_seam_pallas(jnp.asarray(E), width, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_carve_loop_pallas_matches_scan(rng):
    """Full multi-seam carve with the Pallas seam finder == scan path."""
    from dct_carver_tpu.ops.carve import carve_n_seams

    H, W = 32, 256
    img = rng.integers(0, 256, size=(H, W), dtype=np.uint8)
    luma = jnp.asarray(img.astype(np.float32) / 255.0)
    scan = carve_n_seams(luma, 6, 8, 0.3, 0.8, use_pallas=False)
    pallas = carve_n_seams(luma, 6, 8, 0.3, 0.8, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(scan.vmap), np.asarray(pallas.vmap))
    np.testing.assert_array_equal(
        np.asarray(scan.energy), np.asarray(pallas.energy)
    )


def test_pallas_supported_gate():
    assert pallas_supported(1080, 1920)
    assert not pallas_supported(1080, 1000)  # W not lane-aligned
    assert not pallas_supported(37, 256)     # H not row-block aligned


@pytest.mark.parametrize("width_frac", [1.0, 0.6, 0.13])
def test_folded_find_seam_matches(width_frac, rng):
    """The folded (sublane-packed) DP — the big-image path of
    find_seam_pallas — must match the scan bitwise, including ties."""
    from dct_carver_tpu.pallas.dp_kernel import _folded_find_seam

    H, W = 40, 256
    width = jnp.int32(max(2, int(W * width_frac)))
    E = rng.random((H, W)).astype(np.float32)
    got = _folded_find_seam(jnp.asarray(E), width, jnp.int32(0),
                            interpret=True)
    ref = _masked_find_seam(jnp.asarray(E), width)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    Eq = (rng.integers(0, 3, size=(H, W)) / 2.0).astype(np.float32)
    got = _folded_find_seam(jnp.asarray(Eq), width, jnp.int32(0),
                            interpret=True)
    ref = _masked_find_seam(jnp.asarray(Eq), width)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_vec_batch_find_seams_matches(rng):
    """The sublane-packed batch DP (batch_dp_kernel) must match the scan
    per image for mixed widths, including ties."""
    from dct_carver_tpu.pallas.batch_dp_kernel import find_seams_vec, vec_supported

    B, H, W = 4, 24, 256
    assert vec_supported(B, H, W)
    E = rng.random((B, H, W)).astype(np.float32)
    widths = jnp.asarray([W, 200, 131, 17], jnp.int32)
    got = find_seams_vec(jnp.asarray(E), widths, jnp.zeros((B,), jnp.int32),
                         interpret=True)
    for i in range(B):
        ref = _masked_find_seam(jnp.asarray(E[i]), widths[i])
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(ref))


def test_streamed_find_seam_matches(rng):
    """The streamed fallback (dp_forward + argmin + dp_backtrack) — the
    big-image path when the folded lane dim is NOT 128-aligned — must match
    the scan bitwise, including ties."""
    from dct_carver_tpu.pallas.dp_kernel import _streamed_find_seam

    H, W = 40, 384  # W // FOLD == 48, not a multiple of 128
    for make in (lambda: rng.random((H, W)).astype(np.float32),
                 lambda: (rng.integers(0, 3, size=(H, W)) / 2.0
                          ).astype(np.float32)):
        E = make()
        for width in (W, 250):
            got = _streamed_find_seam(jnp.asarray(E), jnp.int32(width),
                                      jnp.int32(0), interpret=True)
            ref = _masked_find_seam(jnp.asarray(E), jnp.int32(width))
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_find_seam_big_image_dispatch(rng, monkeypatch):
    """Above the fused VMEM cap, aligned folds use the folded kernel and
    unaligned folds fall back to the streamed path — both matching scan."""
    from dct_carver_tpu.pallas import dp_kernel

    monkeypatch.setattr(dp_kernel, "MAX_FUSED_PARENT_BYTES", 0)
    H = 16
    for W in (1024, 384):  # W//FOLD = 128 (folded) and 48 (streamed)
        E = rng.random((H, W)).astype(np.float32)
        got = dp_kernel.find_seam_pallas(jnp.asarray(E), jnp.int32(W),
                                         interpret=True)
        ref = _masked_find_seam(jnp.asarray(E), jnp.int32(W))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_carve_nonaligned_width_pallas_matches_scan(rng):
    """Widths not lane-aligned are edge-padded into the kernel path; the
    carve must stay bitwise-identical to the unpadded scan path and report
    buffers at the original width."""
    from dct_carver_tpu.ops.carve import carve_n_seams

    H, W = 32, 200
    luma = jnp.asarray(rng.random((H, W)).astype(np.float32))
    scan = carve_n_seams(luma, 5, 8, 0.3, 0.8, use_pallas=False)
    pal = carve_n_seams(luma, 5, 8, 0.3, 0.8, use_pallas=True)
    assert pal.vmap.shape == (H, W)
    np.testing.assert_array_equal(np.asarray(scan.vmap), np.asarray(pal.vmap))
    np.testing.assert_array_equal(
        np.asarray(scan.energy)[:, : W - 5], np.asarray(pal.energy)[:, : W - 5]
    )
    np.testing.assert_array_equal(
        np.asarray(scan.luma)[:, : W - 5], np.asarray(pal.luma)[:, : W - 5]
    )
