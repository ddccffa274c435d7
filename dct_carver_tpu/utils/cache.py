"""Persistent XLA compilation cache.

Compiles over the tunneled TPU take tens of seconds to minutes (remote
Mosaic/XLA helper); the persistent cache makes every repeat invocation of the
CLI / bench with the same shapes near-instant.  Enabled by the CLI and bench
entry points; library users can call `enable_compilation_cache()` themselves.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_enabled = False


def enable_compilation_cache(path: str | None = None) -> str:
    global _enabled
    import jax

    cache_dir = path or os.environ.get(
        "DCT_CARVER_CACHE",
        os.path.expanduser("~/.cache/dct_carver_tpu/xla"),
    )
    if not _enabled:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    return cache_dir
