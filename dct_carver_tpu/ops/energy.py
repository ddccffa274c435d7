"""Luma conversion and the public energy-map API.

The reference has two near-duplicate energy paths with different luma and
window centering (carve path `src/render.c:134-157` vs preview path
`src/render.c:31-59,462`); this module unifies them behind one function with a
`luma` mode switch, as SURVEY §3.2 prescribes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .dct import dct_energy_map

__all__ = ["to_luma", "energy_map", "normalize_to_u8", "LUMA_MODES"]

LUMA_MODES = ("bt709", "bt601_studio")


def to_luma(image: jax.Array, mode: str = "bt709", dtype=jnp.float32) -> jax.Array:
    """(H, W[, C]) u8/float image -> (H, W) luma plane.

    * "bt709": liblqr carve-path luma, [0,1] scale (src/render.c:314 LQR_ER_LUMA).
    * "bt601_studio": preview-path studio luma, u8 scale with C-truncation
      (src/render.h:5).
    """
    img = image.astype(dtype)
    if img.ndim == 2:
        ch = None
    elif img.shape[-1] == 1:
        img, ch = img[..., 0], None
    else:
        ch = img.shape[-1]

    if mode == "bt709":
        if ch is None:
            return img / 255.0
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        return (0.2126 * r + 0.7152 * g + 0.0722 * b) / 255.0
    if mode == "bt601_studio":
        if ch is None:
            return jnp.floor(img)
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        return jnp.floor(16.0 + r * 0.2568 + g * 0.5041 + b * 0.0979)
    raise ValueError(f"unknown luma mode {mode!r}; options: {LUMA_MODES}")


def energy_map(
    image: jax.Array,
    blocksize: int = 8,
    edges: float = 0.0,
    textures: float = 1.0,
    *,
    luma: str = "bt709",
    row_block: int | None = None,
    center: str = "carve",
    dtype=jnp.float32,
) -> jax.Array:
    """Full-image DCT energy from an RGB/gray image (src/dct.c:96-110 semantics).

    The preview path (src/render.c:421-479) is `luma="bt601_studio",
    center="preview"`; the carve path (the default) is what seam selection
    uses."""
    plane = to_luma(image, luma, dtype)
    return dct_energy_map(plane, blocksize, edges, textures,
                          row_block=row_block, center=center)


def normalize_to_u8(energy: jax.Array) -> jax.Array:
    """Min-max normalize to u8, round half-up (DOUBLE2GUCHAR, src/render.h:6)."""
    e = energy.astype(jnp.float32)
    mn = jnp.min(e)
    mx = jnp.max(e)
    scale = jnp.where(mx > mn, 255.0 / (mx - mn), 0.0)
    return jnp.floor((e - mn) * scale + 0.5).astype(jnp.uint8)
