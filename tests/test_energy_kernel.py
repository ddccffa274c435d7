"""Pallas fused energy kernel vs the XLA reference path (interpret mode).

On CPU, LLVM contracts the mul+add chains to FMA inside jitted/fused code
but not in eagerly-dispatched ops, so cross-context comparisons carry a few
ulp of noise — these tests use a tight allclose.  On TPU the compiled kernel
is bit-identical to the XLA chain path (verified on real hardware — see the
module docstring of pallas/energy_kernel.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dct_carver_tpu.ops.dct import dct_energy_map
from dct_carver_tpu.pallas.energy_kernel import (
    dct_energy_pallas, energy_pallas_supported,
)


@pytest.mark.parametrize("blocksize", [2, 4, 8, 16])
def test_energy_kernel_bitwise_equal(rng, blocksize):
    luma = jnp.asarray(rng.random((70, 150)).astype(np.float32))
    ref = dct_energy_map(luma, blocksize, 0.3, 0.9)
    got = dct_energy_pallas(luma, blocksize, 0.3, 0.9, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=1e-7)


def test_energy_kernel_preview_center(rng):
    luma = jnp.asarray(rng.random((40, 90)).astype(np.float32))
    ref = dct_energy_map(luma, 8, 0.5, 0.5, center="preview")
    got = dct_energy_pallas(luma, 8, 0.5, 0.5, center="preview",
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=1e-7)


def test_energy_kernel_wide_uses_looped_xla_form(rng):
    """Widths past the flat/looped XLA switch (Cout > 512) must still match."""
    luma = jnp.asarray(rng.random((66, 700)).astype(np.float32))
    ref = dct_energy_map(luma, 8, 0.0, 1.0)
    got = dct_energy_pallas(luma, 8, 0.0, 1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=1e-7)


def test_supported_limit():
    assert energy_pallas_supported(3840, 16)
    assert not energy_pallas_supported(100_000, 8)
