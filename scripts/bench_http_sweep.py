"""Serving saturation sweep: offered load -> latency/throughput curve.

Round 4 measured two HTTP points (a lone request; 8 simultaneous clients).
This drives the production server (zerovox_tpu/serving/) with open-loop
POISSON arrivals at a ladder of offered rates — optionally a mixed
stream/batch blend — and reports, per rate:

  * achieved throughput vs offered (the knee is where they diverge),
  * p50/p95/p99 latency (first PCM byte for streaming requests, full
    response wall for non-streaming),
  * mean formed batch size and max batch seen (DynamicBatcher stats),
  * in-flight high-water mark (the open-loop queue depth proxy).

Open-loop arrivals matter: closed-loop clients self-throttle at
saturation and hide the knee, while Poisson arrivals keep offering work
and expose queue growth as p99 blowup. The capacity statement
("X utt/s at p99 < Y ms") comes from the highest rate whose p99 stays
under the bound AND whose achieved rate tracks offered within 5%.

    python scripts/bench_http_sweep.py --rates 2,5,10,20,30,45,60 \
        --duration 15 --stream-frac 0.25 --out-json docs/bench_http_r5.json

BASELINE config #5 ("continuous utterance stream") measured as a curve.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench_http import HDR, TEXT, _post, _stream_ttfb  # noqa: E402


def _p(vals, q):
    if not vals:
        return None
    if len(vals) == 1:
        return vals[0]
    return statistics.quantiles(vals, n=100)[q - 1]


class _Flight:
    """In-flight counter with a high-water mark."""

    def __init__(self):
        self.lock = threading.Lock()
        self.now = 0
        self.peak = 0

    def __enter__(self):
        with self.lock:
            self.now += 1
            self.peak = max(self.peak, self.now)

    def __exit__(self, *a):
        with self.lock:
            self.now -= 1


def run_rate(host, port, rate: float, duration: float, stream_frac: float,
             rng: np.random.Generator) -> dict:
    """One open-loop Poisson run at `rate` req/s for `duration` seconds."""
    lat_batch, lat_stream, errors = [], [], [0]
    flight = _Flight()
    threads = []

    def do_batch(text):
        try:
            with flight:
                t0 = time.perf_counter()
                _post(host, port, {"text": text, "voice": "bench"})
                lat_batch.append((time.perf_counter() - t0) * 1000)
        except Exception:
            errors[0] += 1

    def do_stream(text):
        try:
            with flight:
                tf, _, _ = _stream_ttfb(host, port, {"text": text,
                                                     "voice": "bench",
                                                     "stream": True})
                lat_stream.append(tf * 1000)
        except Exception:
            errors[0] += 1

    t_start = time.perf_counter()
    t_next = t_start
    n_sent = 0
    while True:
        t_next += float(rng.exponential(1.0 / rate))
        now = time.perf_counter()
        if t_next - t_start > duration:
            break
        if t_next > now:
            time.sleep(t_next - now)
        text = TEXT[: 40 + 15 * (n_sent % 5)]
        fn = do_stream if rng.random() < stream_frac else do_batch
        th = threading.Thread(target=fn, args=(text,), daemon=True)
        th.start()
        threads.append(th)
        n_sent += 1
    for th in threads:
        th.join(timeout=120)
    wall = time.perf_counter() - t_start

    done = len(lat_batch) + len(lat_stream)
    lat_all = sorted(lat_batch + lat_stream)
    return {
        "offered_rps": rate,
        "sent": n_sent,
        "completed": done,
        "errors": errors[0],
        "achieved_rps": round(done / wall, 2),
        "p50_ms": round(_p(lat_all, 50), 1) if lat_all else None,
        "p95_ms": round(_p(lat_all, 95), 1) if lat_all else None,
        "p99_ms": round(_p(lat_all, 99), 1) if lat_all else None,
        "stream_ttfb_p50_ms": round(_p(lat_stream, 50), 1)
        if lat_stream else None,
        "stream_ttfb_p99_ms": round(_p(lat_stream, 99), 1)
        if lat_stream else None,
        "inflight_peak": flight.peak,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rates", default="2,5,10,20,30,45,60",
                    help="offered req/s ladder")
    ap.add_argument("--duration", type=float, default=15.0,
                    help="seconds per rate point")
    ap.add_argument("--stream-frac", type=float, default=0.25,
                    help="fraction of requests using stream=true")
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-delay-ms", type=float, default=20.0)
    ap.add_argument("--p99-bound-ms", type=float, default=500.0,
                    help="latency bound for the capacity statement")
    ap.add_argument("--out-json", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from zerovox_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from zerovox_tpu.serving import VoiceRegistry, make_server
    from zerovox_tpu.serving.server import serve_in_thread
    from zerovox_tpu.synthesize import ZeroVoxTTS

    synth = ZeroVoxTTS.from_random(seed=0)
    rng_np = np.random.default_rng(0)
    voices = VoiceRegistry()
    voices.add_from_wav("bench", synth,
                        rng_np.normal(size=2 * 22050).astype(np.float32) * 0.1)
    emb = voices.get("bench")

    # every batch size the DynamicBatcher can form compiles its own
    # tts_batch program — warm them ALL so mid-sweep compiles never land
    # in a latency sample
    print("warmup (compiles for every batch size + stream path)...",
          file=sys.stderr, flush=True)
    synth.warmup(spkemb=emb,
                 batch_sizes=tuple(range(1, args.max_batch + 1)))
    for _ in synth.tts_stream(TEXT, emb):
        pass

    srv = make_server(synth, voices, port=0, max_batch=args.max_batch,
                      max_delay_ms=args.max_delay_ms)
    serve_in_thread(srv)
    host, port = srv.server_address[:2]

    rows = []
    rng = np.random.default_rng(7)
    for rate in [float(r) for r in args.rates.split(",")]:
        before_b = srv.batcher.stats.batches
        before_r = srv.batcher.stats.requests
        row = run_rate(host, port, rate, args.duration, args.stream_frac, rng)
        db = srv.batcher.stats.batches - before_b
        dr = srv.batcher.stats.requests - before_r
        row["mean_batch_size"] = round(dr / db, 2) if db else None
        row["max_batch_seen"] = srv.batcher.stats.max_batch_seen
        rows.append(row)
        print(row, file=sys.stderr, flush=True)
        time.sleep(2.0)  # drain between rate points

    # capacity: highest rate with p99 under bound and achieved ~ offered
    cap = None
    for row in rows:
        if (row["p99_ms"] is not None
                and row["p99_ms"] <= args.p99_bound_ms
                and row["errors"] == 0
                and row["achieved_rps"] >= 0.95 * row["offered_rps"]):
            cap = row
    out = {
        "stream_frac": args.stream_frac,
        "max_batch": args.max_batch,
        "max_delay_ms": args.max_delay_ms,
        "duration_s_per_point": args.duration,
        "rows": rows,
        "capacity": None if cap is None else {
            "utterances_per_s": cap["achieved_rps"],
            "at_p99_ms": cap["p99_ms"],
            "p99_bound_ms": args.p99_bound_ms,
            "statement": (f"{cap['achieved_rps']} utt/s sustained at "
                          f"p99 {cap['p99_ms']} ms "
                          f"(bound {args.p99_bound_ms} ms)")},
    }
    srv.shutdown_serving()
    print(json.dumps(out))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
