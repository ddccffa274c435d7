"""The fused apply kernel must match remove_seam + _edge_fill bitwise.

Covers interior seams, seams hugging both borders, the seam-removes-the-
edge-column case that changes the dead-region fill value, and shrunken
logical widths (mid-carve states).  Runs in interpreter mode on the CPU
mesh like the other kernel tests.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dct_carver_tpu.ops.carve import _edge_fill
from dct_carver_tpu.ops.dp import remove_seam
from dct_carver_tpu.pallas.apply_kernel import apply_seam_pallas, new_edge_value


def _reference(luma, origcol, energy, seam, width):
    new_width = width - 1
    luma2 = _edge_fill(remove_seam(luma, seam), jnp.asarray(new_width))
    return (np.asarray(luma2), np.asarray(remove_seam(origcol, seam)),
            np.asarray(remove_seam(energy, seam)))


@pytest.mark.parametrize("mode", ["interior", "left", "right-edge", "shrunk"])
def test_apply_kernel_matches_xla(mode):
    rng = np.random.default_rng(3)
    H, W = 16, 256
    luma = jnp.asarray(rng.random((H, W), dtype=np.float32))
    origcol = jnp.asarray(rng.integers(0, 4 * W, (H, W)), jnp.int32)
    energy = jnp.asarray(rng.random((H, W), dtype=np.float32))

    width = W - 5 if mode == "shrunk" else W
    if mode == "interior":
        seam = (np.cumsum(rng.integers(-1, 2, H)) + 100) % (width - 2) + 1
    elif mode == "left":
        seam = np.minimum(np.arange(H), 2)
    elif mode == "right-edge":
        seam = np.full(H, width - 1)  # removes the logical edge column
    else:
        seam = np.full(H, width - 3)
    seam = jnp.asarray(seam, jnp.int32)
    w = jnp.asarray(width, jnp.int32)

    edge = new_edge_value(luma, seam, w)
    l2, oc2, e2 = apply_seam_pallas(luma, origcol, energy, seam, edge, w,
                                    interpret=True)
    rl, roc, re = _reference(luma, origcol, energy, seam, width)

    # dead region of origcol/energy is garbage in both paths; compare the
    # live region for them, the full plane (incl. the edge fill) for luma
    live = width - 1
    assert np.array_equal(np.asarray(l2)[:, :width], rl[:, :width])
    # the kernel edge-fills everything >= new_width; XLA path only fills
    # within the old logical width — compare the defined region
    assert np.array_equal(np.asarray(oc2)[:, :live], roc[:, :live])
    assert np.array_equal(np.asarray(e2)[:, :live], re[:, :live])
