"""Persistent XLA compilation cache.

TPU compiles of the full medium model take minutes (notably through remote
compile tunnels); enabling JAX's persistent compilation cache makes every
program compile once per machine instead of once per process. Called by
bench.py and the CLIs; controlled by ZEROVOX_COMPILE_CACHE (set to "0" to
disable, or to a directory path to relocate).
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compile_cache() -> str | None:
    spec = os.environ.get("ZEROVOX_COMPILE_CACHE", "")
    if spec == "0":
        return None
    cache_dir = spec or str(Path.home() / ".cache" / "zerovox_tpu" / "xla_cache")
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return cache_dir
