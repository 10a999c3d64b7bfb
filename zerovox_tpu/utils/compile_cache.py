"""Persistent XLA compilation cache + compile observability.

TPU compiles of the full medium model take minutes (notably through remote
compile tunnels); enabling JAX's persistent compilation cache makes every
program compile once per machine instead of once per process. Called by
bench.py and the CLIs; controlled by ZEROVOX_COMPILE_CACHE (set to "0" to
disable, or to a directory path to relocate).

Observability (SURVEY.md §5 tracing row): `enable_compile_cache()` also
registers jax.monitoring listeners counting persistent-cache hits/misses,
the compile seconds saved by hits, and the cold backend-compile seconds
paid by misses. `cache_stats()` snapshots the counters;
`format_cache_stats()` is the one-liner the CLIs print. On a backend where
a cold compile costs minutes, "did the cache hit?" is an operational
question, not a curiosity.
"""

from __future__ import annotations

import os
import threading
from pathlib import Path

_lock = threading.Lock()
_stats = {
    "requests": 0,            # cacheable compile requests
    "hits": 0,                # persistent-cache hits
    "misses": 0,              # persistent-cache misses (cold compiles)
    "saved_sec": 0.0,         # compile seconds avoided by hits
    "retrieval_sec": 0.0,     # seconds spent reading cached executables
    "backend_compile_sec": 0.0,  # seconds spent in cold backend compiles
    "backend_compiles": 0,    # backend compile invocations (incl. uncacheable)
}
_listeners_registered = False


def _on_event(event: str, **kw) -> None:
    with _lock:
        if event == "/jax/compilation_cache/compile_requests_use_cache":
            _stats["requests"] += 1
        elif event == "/jax/compilation_cache/cache_hits":
            _stats["hits"] += 1
        elif event == "/jax/compilation_cache/cache_misses":
            _stats["misses"] += 1


def _on_duration(event: str, duration_secs: float, **kw) -> None:
    with _lock:
        if event == "/jax/compilation_cache/compile_time_saved_sec":
            _stats["saved_sec"] += duration_secs
        elif event == "/jax/compilation_cache/cache_retrieval_time_sec":
            _stats["retrieval_sec"] += duration_secs
        elif event == "/jax/core/compile/backend_compile_duration":
            _stats["backend_compile_sec"] += duration_secs
            _stats["backend_compiles"] += 1


def _register_listeners() -> None:
    global _listeners_registered
    if _listeners_registered:
        return
    from jax import monitoring

    monitoring.register_event_listener(_on_event)
    monitoring.register_event_duration_secs_listener(_on_duration)
    _listeners_registered = True


def cache_stats() -> dict:
    """Snapshot of compile/cache counters since process start."""
    with _lock:
        return dict(_stats)


def format_cache_stats() -> str:
    s = cache_stats()
    return (f"compile cache: {s['hits']} hits / {s['misses']} misses "
            f"({s['requests']} requests); saved {s['saved_sec']:.1f}s, "
            f"cold compiles {s['backend_compiles']} "
            f"({s['backend_compile_sec']:.1f}s)")


def enable_compile_cache() -> str | None:
    spec = os.environ.get("ZEROVOX_COMPILE_CACHE", "")
    if spec == "0":
        return None
    cache_dir = spec or str(Path.home() / ".cache" / "zerovox_tpu" / "xla_cache")
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    _register_listeners()
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return cache_dir
