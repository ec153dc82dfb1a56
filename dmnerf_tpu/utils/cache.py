"""Persistent XLA compilation cache.

The axon TPU tunnel makes first-compiles expensive (minutes for the full train
step); caching compiled executables on local disk makes every subsequent
process start in seconds. Called by all CLI entry points and bench.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None):
    import jax

    path = path or os.environ.get("DMNERF_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/dmnerf_jax"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # older jax versions
        print(f"compilation cache unavailable: {e}")
