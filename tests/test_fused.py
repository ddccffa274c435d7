"""Fused Pallas carve engine (interpret mode) vs the XLA carve loop."""

import numpy as np
import pytest

import jax.numpy as jnp

from dct_carver_tpu.ops.carve import carve_n_seams
from dct_carver_tpu.ops.fused import fused_carve_n_seams, fused_supported


@pytest.mark.parametrize("hwnb", [(32, 256, 6, 8), (16, 200, 4, 4), (24, 300, 5, 8)])
def test_fused_matches_xla_loop(hwnb, rng):
    H, W, n, bs = hwnb
    img = rng.integers(0, 256, size=(H, W), dtype=np.uint8)
    luma = jnp.asarray(img.astype(np.float32) / 255.0)
    ref = carve_n_seams(luma, n, bs, 0.3, 0.8, use_pallas=False)
    got = fused_carve_n_seams(luma, n, bs, 0.3, 0.8, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.vmap), np.asarray(got.vmap))
    wv = W - n
    # luma compaction is bitwise; strip energies may differ by 1 ulp from the
    # XLA einsum order (kernel uses jnp.dot), so compare those with tolerance
    np.testing.assert_array_equal(
        np.asarray(ref.luma)[:, :wv], np.asarray(got.luma)[:, :wv]
    )
    np.testing.assert_allclose(
        np.asarray(ref.energy)[:, :wv], np.asarray(got.energy)[:, :wv],
        rtol=2e-6, atol=1e-12,  # a few ulps of dot-order divergence
    )
    assert int(got.width) == wv


def test_fused_supported_gate():
    assert fused_supported(1080, 1920, 8)
    assert not fused_supported(1081, 1920, 8)   # H not row-block aligned
    assert not fused_supported(64, 16, 8)       # too narrow for the strip
