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

    Execution routing (`parallel=` framework knob, CarverConfig.parallel):
    "spatial" column-shards ONE image over the device mesh; "batch"
    data-parallels an image STACK — pass a (B, H, W[, C]) array and the
    result fields come back stacked over B; "auto" picks spatial with >1
    device (batch for 4-D inputs).  Seams are route-independent.
    """
    image = np.asarray(image)
    cfg = CarverConfig(
        edges=edges, textures=textures, blocksize=blocksize,
        seams_number=seams_number, vertically=vertically,
        output_energy=output_energy, output_seams=output_seams,
        **framework_knobs,
    )
    if cfg.parallel == "batch" or (cfg.parallel == "auto" and image.ndim == 4):
        return _carve_stack(image, seams_number, cfg)
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


def _carve_stack(images: np.ndarray, seams_number: int,
                 cfg: CarverConfig) -> CarveResult:
    """Data-parallel carve of a (B, H, W[, C]) stack (parallel.mesh —
    BASELINE config 4).  Every image is carved independently, exactly as
    `render()` treats each invocation (src/render.c:327); results stack
    over B."""
    import jax
    import jax.numpy as jnp

    from .ops.carve import reconstruct_enlarged
    from .parallel.mesh import carve_batch

    if images.ndim not in (3, 4):
        raise ValueError(
            f"parallel='batch' needs a (B, H, W[, C]) stack; got shape "
            f"{images.shape}")
    if seams_number == 0:
        B, h, w = images.shape[:3]
        return CarveResult(
            image=images.copy(),
            visibility_map=(np.zeros((B, h, w), np.int32)
                            if cfg.output_seams else None),
            energy_image=None,
        )
    if cfg.vertically:
        images = np.swapaxes(images, 1, 2)
    n = abs(seams_number)
    if n >= images.shape[2]:
        raise ValueError(
            f"cannot change dimension by {seams_number}: images are "
            f"{images.shape[2]} wide")
    kw = dict(
        blocksize=cfg.blocksize, edges=cfg.edges, textures=cfg.textures,
        strip_update=cfg.strip_update, energy=cfg.energy_function,
        luma=cfg.luma, delta_x=cfg.delta_x, rigidity=cfg.rigidity,
        tie=cfg.tie,
    )
    if seams_number < 0:
        out, vmaps = carve_batch(images, n, **kw)
    else:
        _, vmaps = carve_batch(images, n, reconstruct=False, **kw)
        out = jax.jit(jax.vmap(
            lambda im, vm: reconstruct_enlarged(im, vm, n)
        ))(jnp.asarray(images), vmaps)
    out = np.asarray(jax.device_get(out))
    vmaps = np.asarray(jax.device_get(vmaps))
    if cfg.vertically:
        out = np.swapaxes(out, 1, 2)
        vmaps = np.swapaxes(vmaps, 1, 2)
    return CarveResult(
        image=out,
        visibility_map=vmaps if cfg.output_seams else None,
        energy_image=None,  # per-image export: use Carver(...).energy_image()
    )
