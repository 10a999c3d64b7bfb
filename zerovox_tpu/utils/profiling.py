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


def forced_device_time(dispatch, probe, iters=(4, 16), warmup: int = 2) -> float:
    """Per-call device seconds via marginal forced timing.

    On remote/tunneled TPU backends `jax.block_until_ready` can return
    before device execution finishes (measured here: an 8192^3 bf16 matmul
    "completed" in 0.02 ms, 225x over the v5e peak — so any pure
    block_until_ready timing is fiction). The only reliable fence is a
    device->host fetch of a value data-dependent on the result. Because a
    TPU core executes programs in submission order, fetching a probe of the
    LAST output forces every previously dispatched program too.

    This times `dispatch()` chained n times for two chain lengths and
    returns the marginal cost per call — the constant (RTT + probe fetch +
    dispatch overhead) cancels in the difference.

    dispatch: () -> device value (each call must enqueue one program run)
    probe:    (value) -> small device array to fetch (e.g. a f32 scalar)
    """
    import time as _time

    import jax as _jax

    n1, n2 = iters
    assert n2 > n1 >= 1

    def run(n):
        out = None
        for _ in range(warmup):
            out = dispatch()
        _jax.device_get(probe(out))
        t0 = _time.perf_counter()
        for _ in range(n):
            out = dispatch()
        _jax.device_get(probe(out))
        return _time.perf_counter() - t0

    t1, t2 = run(n1), run(n2)
    return max((t2 - t1) / (n2 - n1), 0.0)
