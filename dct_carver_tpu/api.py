"""Top-level one-call API — the analog of the plugin's render() entry point
(`/root/reference/src/render.c:327-419` / PDB procedure `src/main.c:79-105`).
"""

from __future__ import annotations

import numpy as np

from .models.carver import Carver, CarveResult
from .utils.config import CarverConfig

__all__ = ["carve", "CarveResult", "CarverConfig"]


def carve(
    image,
    seams_number: int,
    *,
    blocksize: int = 8,
    edges: float = 0.0,
    textures: float = 1.0,
    vertically: bool = False,
    output_energy: bool = False,
    output_seams: bool = False,
    **framework_knobs,
) -> CarveResult:
    """Retarget `image` by `seams_number` seams (signed: <0 removes, >0 inserts;
    `vertically=True` changes the HEIGHT — src/render.c:358-364 semantics).

    Defaults mirror the plugin's (src/main.c:30-40).
    """
    image = np.asarray(image)
    cfg = CarverConfig(
        edges=edges, textures=textures, blocksize=blocksize,
        seams_number=seams_number, vertically=vertically,
        output_energy=output_energy, output_seams=output_seams,
        **framework_knobs,
    )
    carver = Carver(image, cfg)
    h, w = image.shape[:2]
    if seams_number == 0:
        return CarveResult(
            image=image.copy(),
            visibility_map=(np.zeros((h, w), np.int32) if output_seams else None),
            energy_image=(carver.energy_image() if output_energy else None),
        )
    if vertically:
        return carver.resize(w, h + seams_number)
    return carver.resize(w + seams_number, h)
