"""Common JAX runtime setup: persistent compilation cache.

Pallas + big-sort compiles take minutes through this platform's remote
compile helper; the persistent cache makes every repeat shape instant.
"""

from __future__ import annotations

import os

import jax

_DONE = False


def setup(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    cache_dir = cache_dir or os.environ.get(
        "SEGS_JAX_CACHE", os.path.expanduser("~/.cache/jax_comp")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        # unwritable cache dir must never break an app/test import —
        # compiles just lose persistence
        _DONE = True
        return
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _DONE = True
