"""Checkpoint / resume of carver state (SURVEY §5).

The reference persists only its 9 settings across invocations
(`gimp_set_data`, src/main.c:166-167,219-220).  Here the whole mid-carve state
(current luma + origcol + vmap + width + energy) is a pytree; a long carve can
be split into chunks of seams with a durable snapshot between chunks —
checkpoint-restart for the seam loop on preemptible TPU jobs.

Format: a single .npz (portable; arrays this small need no orbax).  Sharded
state is fetched to host before saving — a carve checkpoint is megabytes, so
host gather is cheap and keeps one format everywhere.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import jax.numpy as jnp

from ..ops.carve import CarveState
from .config import CarverConfig

__all__ = ["save_state", "load_state", "carve_resumable",
           "save_sharded", "load_sharded"]

_FORMAT_VERSION = 1


# ------------------------------------------------- sharded (orbax) format --

def save_sharded(path: str, state, meta: dict) -> None:
    """Checkpoint a MESH-SHARDED carve state (parallel.spatial
    SpatialCarveState or any pytree of sharded arrays) with orbax.

    Unlike `save_state`'s host-gathered .npz, each host writes only its own
    shards (orbax OCDBT), so an 8K-panorama spatial carve on N hosts
    checkpoints without materializing the image on one host."""
    import os
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), state, force=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"version": _FORMAT_VERSION, **meta}, f)


def load_sharded(path: str, mesh, axis: str, state_cls):
    """Restore a sharded checkpoint onto `mesh` (columns on `axis`).
    Returns (state, meta)."""
    import os
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta["version"] != _FORMAT_VERSION:
        raise ValueError(f"checkpoint version {meta['version']} unsupported")

    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.join(path, "state"))
    def put(name, x):
        x = jnp.asarray(x)
        if x.ndim == 0:
            return x
        if name == "image" and x.ndim == 3:
            spec = P(None, axis, None)
        elif name == "image" and x.shape[0] == 1:
            spec = P(None, axis)   # placeholder (1, nsh)
        else:
            spec = P(None, axis)
        return jax.device_put(x, NamedSharding(mesh, spec))

    fields = {k: put(k, v) for k, v in tree.items()}
    return state_cls(**fields), meta


def _config_to_jsonable(config: CarverConfig) -> dict:
    from ..ops.energy_fn import EnergyFunction, BUILTIN_ENERGIES

    d = dataclasses.asdict(config)
    e = d.get("energy")
    if isinstance(e, EnergyFunction):
        if BUILTIN_ENERGIES.get(e.name) is not e:
            raise ValueError(
                "custom EnergyFunction objects cannot be checkpointed; "
                "pass the builtin name in config.energy, or re-supply the "
                "function on resume"
            )
        d["energy"] = e.name
    return d


def save_state(path: str, state: CarveState, config: CarverConfig,
               seams_done: int, n_seams_total: int) -> None:
    meta = {
        "version": _FORMAT_VERSION,
        "seams_done": int(seams_done),
        "n_seams_total": int(n_seams_total),
        "config": _config_to_jsonable(config),
    }
    np.savez_compressed(
        path,
        luma=np.asarray(state.luma),
        origcol=np.asarray(state.origcol),
        vmap=np.asarray(state.vmap),
        width=np.asarray(state.width),
        energy=np.asarray(state.energy),
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
    )


def load_state(path: str):
    """Returns (CarveState, CarverConfig, seams_done, n_seams_total)."""
    z = np.load(path)
    meta = json.loads(bytes(z["meta"]).decode())
    if meta["version"] != _FORMAT_VERSION:
        raise ValueError(f"checkpoint version {meta['version']} unsupported")
    state = CarveState(
        luma=jnp.asarray(z["luma"]),
        origcol=jnp.asarray(z["origcol"]),
        vmap=jnp.asarray(z["vmap"]),
        width=jnp.asarray(z["width"]),
        energy=jnp.asarray(z["energy"]),
    )
    cfg = CarverConfig(**meta["config"])
    return state, cfg, meta["seams_done"], meta["n_seams_total"]


def carve_resumable(
    luma,
    n_seams: int,
    config: CarverConfig,
    *,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 0,
    resume_from: str | None = None,
    progress=None,
):
    """Carve with optional periodic checkpointing and resume.

    Runs the jitted seam loop in chunks of `checkpoint_every` seams (0 = one
    chunk), snapshotting after each chunk.  `progress` is an optional
    `Progress` (utils/progress.py) mirroring the liblqr progress hooks.
    """
    from ..ops.carve import (  # noqa: PLC0415
        make_state, _one_seam, full_energy_map, min_strip_width,
        resolve_use_pallas,
    )
    import jax

    if resume_from is not None:
        state, cfg_loaded, done, total = load_state(resume_from)
        if total != n_seams:
            raise ValueError(
                f"checkpoint was for {total} seams, requested {n_seams}"
            )
        config = cfg_loaded
    energy_fn = config.energy_function
    if resume_from is None:
        state = make_state(jnp.asarray(luma))
        e0 = jax.jit(
            full_energy_map, static_argnames=("blocksize", "energy_fn")
        )(state.luma, config.blocksize, config.edges, config.textures,
          energy_fn=energy_fn)
        state = state._replace(energy=e0)
        done = 0

    chunk = checkpoint_every if checkpoint_every > 0 else n_seams
    # same tiny-image guard as carve_n_seams: strips must fit in the buffer
    n_eff = energy_fn.n if energy_fn is not None else config.blocksize
    strip = config.strip_update and (
        state.luma.shape[1] >= min_strip_width(n_eff, config.delta_x)
    )
    use_pallas = resolve_use_pallas(
        None if config.use_pallas else False, *state.luma.shape
    ) and config.delta_x == 1 and config.rigidity == 0.0

    @jax.jit
    def run_chunk(state, start, count):
        def body(i, s):
            return _one_seam(
                s, (start + i + 1).astype(jnp.int32), config.blocksize,
                config.edges, config.textures, strip, use_pallas,
                config.delta_x, config.rigidity, energy_fn,
            )
        return jax.lax.fori_loop(0, count, body, state)

    if progress is not None:
        progress.init("Resizing width...")
    while done < n_seams:
        count = min(chunk, n_seams - done)
        state = jax.block_until_ready(
            run_chunk(state, jnp.int32(done), jnp.int32(count))
        )
        done += count
        if progress is not None:
            progress.update(done / n_seams)
        if checkpoint_path is not None:
            save_state(checkpoint_path, state, config, done, n_seams)
    if progress is not None:
        progress.end()
    return state
