"""Per-stage timing + RTF measurement utilities.

Mirrors the reference's ad-hoc instrumentation (per-stage synthesis timings,
model.py:310-345; RTF harness, demo.py:100-138) as a small reusable API, and
adds jax.profiler trace capture and compile-cache counters (SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


class StageTimer:
    """Wall-clock stage timer. Call `mark(name)` after each stage; device work
    must be blocked on (jax.block_until_ready) by the caller for honest
    numbers."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.last = self.t0
        self.stages: dict[str, float] = {}

    def mark(self, name: str) -> float:
        now = time.perf_counter()
        dt = now - self.last
        self.stages[name] = self.stages.get(name, 0.0) + dt
        self.last = now
        return dt

    @property
    def total(self) -> float:
        return self.last - self.t0

    def report(self) -> str:
        return ", ".join(f"{k}={v:.4f}s" for k, v in self.stages.items())


@dataclass
class RtfStats:
    """RTF = voice_len_seconds / synth_wall_seconds, mean over iterations
    after warmup (reference demo.py:100-138 methodology)."""

    warmup: int = 10
    rtfs: list = field(default_factory=list)
    latencies: list = field(default_factory=list)
    _iter: int = 0

    def add(self, voice_len_s: float, elapsed_s: float, first_chunk_s: float | None = None):
        self._iter += 1
        if self._iter > self.warmup + 1:
            self.rtfs.append(elapsed_s / max(voice_len_s, 1e-9))
            if first_chunk_s is not None:
                self.latencies.append(first_chunk_s)

    @property
    def mean_rtf(self) -> float:
        return sum(self.rtfs) / len(self.rtfs) if self.rtfs else float("nan")

    @property
    def p50_first_chunk_ms(self) -> float:
        if not self.latencies:
            return float("nan")
        s = sorted(self.latencies)
        return 1000.0 * s[len(s) // 2]


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (TPU-equivalent of torch profilers)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
