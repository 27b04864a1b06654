"""Persistent XLA compile cache.

The jitted greedy-decode loop takes minutes to compile cold on TPU (one-time);
enabling JAX's persistent cache makes every later process start in seconds.
Called by bench.py and the CLI before any jit."""

from __future__ import annotations

import os


def enable_persistent_compile_cache(cache_dir: str | None = None) -> str:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "RTWA_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
