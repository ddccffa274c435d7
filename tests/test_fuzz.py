"""Randomized-configuration parity sweep vs the NumPy oracle.

The targeted tests pin specific shapes/knobs; this module walks a seeded
random grid over (shape, blocksize, weights, seams, image kind,
delta_x/rigidity, strip on/off, pallas on/off) and asserts full-carve
visibility-map parity with `oracle.carve_seams` every time.  Seeded, so
failures reproduce; small shapes keep the sweep under a minute.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dct_carver_tpu.oracle import reference as oracle
from dct_carver_tpu.ops.carve import carve_n_seams


def _image(rng, h, w, kind):
    if kind == "noise":
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if kind == "smooth":
        y = np.linspace(0, 255, h)[:, None]
        x = np.linspace(0, 255, w)[None, :]
        img = ((y + x) / 2).astype(np.uint8)
        return np.repeat(img[..., None], 3, axis=-1)
    if kind == "quantized":  # exact-tie breeding ground
        return (rng.integers(0, 4, size=(h, w, 3)) * 80).astype(np.uint8)
    if kind == "structured":
        img = rng.integers(0, 60, size=(h, w, 3), dtype=np.uint8)
        img[h // 3 : h // 3 + 2, :] = 250
        img[:, w // 2] = 240
        return img
    raise ValueError(kind)


@pytest.mark.parametrize("trial", range(12))
def test_random_config_carve_parity(trial):
    rng = np.random.default_rng(1000 + trial)
    h = int(rng.integers(12, 40))
    w = int(rng.integers(24, 72))
    blocksize = int(rng.choice([2, 4, 8, 16]))
    slider = float(rng.choice([0.0, 0.25, 0.5, 1.0]))
    edges, textures = 1.0 - slider, slider
    n = int(rng.integers(1, min(8, w - 2)))
    kind = ["noise", "smooth", "quantized", "structured"][trial % 4]
    strip = bool(trial % 2)
    use_pallas = trial % 3 == 0  # interpret-mode kernels on CPU

    img = _image(rng, h, w, kind)
    luma = np.asarray(oracle.luma_bt709(img), np.float32)

    _, ref_vmap, _ = oracle.carve_seams(img, n, blocksize, edges, textures)
    got = carve_n_seams(jnp.asarray(luma), n, blocksize, edges, textures,
                        strip_update=strip, use_pallas=use_pallas)
    np.testing.assert_array_equal(
        np.asarray(got.vmap), ref_vmap,
        err_msg=f"trial={trial} h={h} w={w} n={n} bs={blocksize} "
                f"s={slider} kind={kind} strip={strip} pallas={use_pallas}",
    )


@pytest.mark.parametrize("trial", range(6))
def test_random_config_generalized_dp_parity(trial):
    """delta_x/rigidity sweep vs the oracle's generalized recurrence."""
    rng = np.random.default_rng(2000 + trial)
    h = int(rng.integers(12, 32))
    w = int(rng.integers(24, 56))
    dx = int(rng.integers(1, 4))
    rig = float(rng.choice([0.0, 0.3, 1.0, 2.5]))
    n = int(rng.integers(1, 5))
    img = _image(rng, h, w, ["noise", "quantized", "structured"][trial % 3])
    luma = np.asarray(oracle.luma_bt709(img), np.float32)

    _, ref_vmap, _ = oracle.carve_seams(img, n, 8, 0.2, 0.8,
                                        delta_x=dx, rigidity=rig)
    got = carve_n_seams(jnp.asarray(luma), n, 8, 0.2, 0.8,
                        delta_x=dx, rigidity=rig)
    np.testing.assert_array_equal(
        np.asarray(got.vmap), ref_vmap,
        err_msg=f"trial={trial} h={h} w={w} n={n} dx={dx} rig={rig}",
    )


@pytest.mark.parametrize("trial", range(4))
def test_random_enlargement_parity(trial):
    """Random enlargement configs.

    Insertion VALUE semantics (rounded-mean duplicates after every seam
    pixel, border-clamped — liblqr, src/render.c:344-364) are checked
    against a direct scalar replay of the API's own visibility map for
    every image kind; full-pipeline parity vs the f64 oracle only on noise
    images (tie-heavy smooth gradients legitimately diverge between the
    f32 production path and the f64 oracle — the two documented precision
    levels, docs/PARITY.md)."""
    rng = np.random.default_rng(3000 + trial)
    h = int(rng.integers(12, 28))
    w = int(rng.integers(24, 48))
    n = int(rng.integers(1, 6))
    kind = ["noise", "smooth"][trial % 2]
    img = _image(rng, h, w, kind)

    from dct_carver_tpu.api import carve as api_carve

    res = api_carve(img, n, blocksize=8, edges=0.3, textures=0.7,
                    output_seams=True)
    vmap = np.asarray(res.visibility_map)

    # scalar replay of the insertion on the API's own seams
    ref = np.empty((h, w + n, 3), img.dtype)
    for i in range(h):
        pos = 0
        for j in range(w):
            ref[i, pos] = img[i, j]
            pos += 1
            if vmap[i, j] > 0:
                nbr = img[i, min(j + 1, w - 1)]
                val = np.floor(
                    (img[i, j].astype(np.float64) + nbr) / 2.0 + 0.5)
                ref[i, pos] = val.astype(img.dtype)
                pos += 1
    np.testing.assert_array_equal(np.asarray(res.image), ref,
                                  err_msg=f"trial={trial} h={h} w={w} n={n}")

    if kind == "noise":
        ref_out, ref_vmap = oracle.carve(img, n, 8, 0.3, 0.7)
        np.testing.assert_array_equal(vmap, ref_vmap)
        np.testing.assert_array_equal(np.asarray(res.image), ref_out)
