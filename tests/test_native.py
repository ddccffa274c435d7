"""Native C++ carver vs the NumPy oracle — three-way parity."""

import numpy as np
import pytest

from dct_carver_tpu.oracle import reference as oracle
from dct_carver_tpu.utils.native import (
    native_available, energy_map_native, carve_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library failed to build"
)


@pytest.mark.parametrize("n", [2, 4, 8, 16])
def test_native_energy_matches_oracle(n, make_image):
    img = make_image(24, 31, c=3)
    luma = oracle.luma_bt709(img)
    ref = oracle.energy_map(luma, n, 0.3, 0.9)
    got = energy_map_native(luma, n, 0.3, 0.9)
    # both compute the DCT in f64 and cast to f32; summation orders differ
    # (loops vs einsum) so allow 1-ulp — weight-class flips would be huge
    np.testing.assert_allclose(got, ref, rtol=3e-7, atol=1e-12)


@pytest.mark.parametrize("blocksize", [4, 8])
def test_native_carve_matches_oracle(blocksize, make_image):
    img = make_image(40, 48, c=3)
    luma = oracle.luma_bt709(img)
    n = 6
    _, ref_vmap, _ = oracle.carve_seams(img, n, blocksize, 0.3, 0.9)
    got_vmap = carve_native(luma, n, blocksize, 0.3, 0.9)
    np.testing.assert_array_equal(got_vmap, ref_vmap)


def test_native_carve_gray(make_image):
    img = make_image(32, 40)
    luma = oracle.luma_bt709(img)
    _, ref_vmap, _ = oracle.carve_seams(img, 10, 8, 0.0, 1.0)
    got = carve_native(luma, 10, 8, 0.0, 1.0)
    np.testing.assert_array_equal(got, ref_vmap)


def test_native_rejects_bad_args(make_image):
    luma = oracle.luma_bt709(make_image(16, 16))
    with pytest.raises(ValueError):
        carve_native(luma, 16, 8, 0.0, 1.0)  # n_seams >= W
