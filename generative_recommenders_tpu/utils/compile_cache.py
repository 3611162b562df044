"""Persistent XLA compilation cache setup.

Long shapes (flagship train step, uih=512 M-FALCON serving chunks) take
minutes to compile through a remote-compile relay; persisting compiled
executables makes re-runs warm from disk in seconds. Enabled by every CLI;
override the location with GR_TPU_COMPILE_CACHE, disable with
GR_TPU_COMPILE_CACHE=off.
"""

from __future__ import annotations

import os

import jax


def enable_compile_cache(default_dir: str = "build/xla_cache") -> None:
    cache_dir = os.environ.get("GR_TPU_COMPILE_CACHE", default_dir)
    if cache_dir.lower() == "off":
        return
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
