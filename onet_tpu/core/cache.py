"""Persistent XLA compilation cache.

Full-size Onet train-step compiles take minutes on the axon TPU tunnel and
every fresh process pays them again; the on-disk cache drops warm starts to
seconds. Call once at process start (drivers, bench, entry points).
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", "..",
                                 ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    path = os.path.abspath(cache_dir or os.environ.get(
        "ONET_TPU_CACHE_DIR", DEFAULT_CACHE_DIR))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
