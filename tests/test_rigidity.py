"""delta_x / rigidity — the liblqr lqr_carver_init generalization.

The reference plugin always runs (delta_x=1, rigidity=0)
(`/root/reference/src/render.c:313`); these tests pin the generalized DP
against the oracle spec and check the default stays bitwise-identical to
the classic recurrence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dct_carver_tpu.oracle import reference as oracle
from dct_carver_tpu.ops import dp
from dct_carver_tpu.ops import carve as carve_ops


@pytest.mark.parametrize("delta_x,rigidity", [(1, 0.0), (2, 0.0), (1, 0.5),
                                              (3, 2.0)])
def test_generalized_dp_matches_oracle(rng, delta_x, rigidity):
    E = rng.random((30, 41)).astype(np.float32)
    ref = oracle.find_seam(E, delta_x, rigidity)
    got = np.asarray(dp.find_seam(jnp.asarray(E), delta_x, rigidity))
    np.testing.assert_array_equal(got, ref)


def test_generalized_dp_ties(rng):
    E = (rng.integers(0, 3, size=(24, 32)).astype(np.float32)) / 4.0
    for delta_x in (2, 3):
        ref = oracle.find_seam(E, delta_x, 0.0)
        got = np.asarray(dp.find_seam(jnp.asarray(E), delta_x, 0.0))
        np.testing.assert_array_equal(got, ref)


def test_default_bitwise_unchanged(rng):
    """(1, 0.0) must produce the exact classic recurrence results."""
    E = rng.random((20, 33)).astype(np.float32)
    a = np.asarray(dp.cumulative_energy(jnp.asarray(E)))
    b = np.asarray(dp.cumulative_energy(jnp.asarray(E), 1, 0.0))
    np.testing.assert_array_equal(a, b)


def test_delta_x_2_seam_steps_wider(rng):
    """With delta_x=2 a seam may step 2 columns between rows."""
    H, W = 40, 60
    E = np.ones((H, W), np.float32)
    # cheap zig-zag: low-energy cells 2 apart per row
    cols = (10 + 2 * np.arange(H)) % (W - 4)
    E[np.arange(H), cols] = 0.0
    seam = np.asarray(dp.find_seam(jnp.asarray(E), 2, 0.0))
    steps = np.abs(np.diff(seam))
    assert steps.max() == 2  # uses the wider window
    ref = oracle.find_seam(E, 2, 0.0)
    np.testing.assert_array_equal(seam, ref)


def test_rigidity_straightens_seams(rng):
    """High rigidity must reduce total seam wiggle on noisy energy."""
    E = rng.random((64, 80)).astype(np.float32)
    loose = np.asarray(dp.find_seam(jnp.asarray(E), 1, 0.0))
    stiff = np.asarray(dp.find_seam(jnp.asarray(E), 1, 10.0))
    assert np.abs(np.diff(stiff)).sum() < np.abs(np.diff(loose)).sum()


@pytest.mark.parametrize("delta_x,rigidity", [(2, 0.0), (1, 0.3)])
def test_carve_parity_generalized(delta_x, rigidity, make_image):
    """Full carve loop parity vs the oracle under non-default DP params."""
    img = make_image(36, 44)
    n = 5
    _, ref_vmap, _ = oracle.carve_seams(
        img, n, 8, 0.2, 0.8, delta_x=delta_x, rigidity=rigidity
    )
    with jax.enable_x64(True):
        luma = jnp.asarray(oracle.luma_bt709(img), jnp.float64)
        state = carve_ops.carve_n_seams(
            luma, n, 8, 0.2, 0.8, strip_update=False,
            delta_x=delta_x, rigidity=rigidity,
        )
    np.testing.assert_array_equal(np.asarray(state.vmap), ref_vmap)


def test_strip_update_equals_full_delta_x_2(make_image):
    """The widened strip must still be exact at delta_x=2."""
    img = make_image(48, 80, c=3)
    luma = jnp.asarray(np.asarray(oracle.luma_bt709(img), np.float32))
    full = carve_ops.carve_n_seams(luma, 8, 8, 0.4, 0.8, strip_update=False,
                                   delta_x=2)
    strip = carve_ops.carve_n_seams(luma, 8, 8, 0.4, 0.8, strip_update=True,
                                    delta_x=2)
    np.testing.assert_array_equal(np.asarray(full.vmap), np.asarray(strip.vmap))


def test_config_validation():
    from dct_carver_tpu.utils.config import CarverConfig

    with pytest.raises(ValueError):
        CarverConfig(delta_x=0)
    with pytest.raises(ValueError):
        CarverConfig(rigidity=-1.0)
    assert CarverConfig(delta_x=2, rigidity=0.5).delta_x == 2


def test_api_carve_with_rigidity(make_image):
    from dct_carver_tpu.api import carve

    img = make_image(32, 40, c=3)
    res = carve(img, -6, rigidity=0.5, delta_x=2)
    assert res.image.shape == (32, 34, 3)
