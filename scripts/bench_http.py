"""HTTP serving overhead: what the wire adds on top of the direct API.

Boots the production server (zerovox_tpu/serving/) in-process over a real
engine and measures, through actual localhost HTTP:

  * streaming time-to-first-audio-byte (POST /tts {"stream": true}) vs the
    direct `tts_stream` first-chunk latency measured in the same process —
    the delta is the serving layer's latency cost on the headline metric;
  * non-streaming POST /tts wall vs a direct `tts()` call;
  * concurrent-client throughput through the dynamic batcher (requests/s
    and the batches actually formed).

Random weights predict near-zero durations, so utterance *content* is
degenerate — but every timed program (encode, speculative decode, first
vocoder window, fetch) runs at its real shape, so latency and overhead
numbers are representative. Run on the TPU host:

    python scripts/bench_http.py [--iters 20] [--concurrent 8]
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import statistics
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TEXT = ("The quick brown fox jumps over the lazy dog while the curious cat "
        "watches from a sunny windowsill.")
HDR = 44  # streaming WAV header bytes before the first PCM payload


def _p(vals, q):
    return statistics.quantiles(vals, n=100)[q - 1] if len(vals) > 1 else vals[0]


def _post(host, port, payload, timeout=600):
    conn = http.client.HTTPConnection(host, port, timeout=timeout)
    try:
        conn.request("POST", "/tts", json.dumps(payload),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        return resp.read()
    finally:
        conn.close()


def _stream_ttfb(host, port, payload, timeout=600):
    """Returns (seconds to first PCM byte, seconds total, total PCM bytes)."""
    conn = http.client.HTTPConnection(host, port, timeout=timeout)
    try:
        t0 = time.perf_counter()
        conn.request("POST", "/tts", json.dumps(payload),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        got = b""
        t_first = None
        while True:
            piece = resp.read1(65536)
            if not piece:
                break
            got += piece
            if t_first is None and len(got) > HDR:
                t_first = time.perf_counter() - t0
        return t_first, time.perf_counter() - t0, len(got) - HDR
    finally:
        conn.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--concurrent", type=int, default=8)
    ap.add_argument("--out-json", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke test off-TPU)")
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
    rng = np.random.default_rng(0)
    voices = VoiceRegistry()
    voices.add_from_wav("bench", synth,
                        rng.normal(size=2 * 22050).astype(np.float32) * 0.1)
    emb = voices.get("bench")

    print("warmup (compiles + first-fetch)...", file=sys.stderr, flush=True)
    synth.warmup(spkemb=emb, batch_sizes=(1, args.concurrent))
    for _ in synth.tts_stream(TEXT, emb):
        pass

    srv = make_server(synth, voices, port=0, max_batch=args.concurrent,
                      max_delay_ms=20)
    serve_in_thread(srv)
    host, port = srv.server_address[:2]
    results = {}

    # --- streaming TTFB: HTTP vs direct ---------------------------------
    http_ttfb, http_total = [], []
    for _ in range(args.iters):
        tf, tt, _ = _stream_ttfb(host, port,
                                 {"text": TEXT, "voice": "bench",
                                  "stream": True})
        http_ttfb.append(tf * 1000)
        http_total.append(tt * 1000)
    direct_first = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        for chunk in synth.tts_stream(TEXT, emb):
            np.asarray(chunk)  # materialize like a consumer would
            direct_first.append((time.perf_counter() - t0) * 1000)
            break
    results["stream"] = {
        "http_ttfb_p50_ms": round(_p(http_ttfb, 50), 1),
        "http_ttfb_p95_ms": round(_p(http_ttfb, 95), 1),
        "direct_first_chunk_p50_ms": round(_p(direct_first, 50), 1),
        "http_overhead_p50_ms": round(_p(http_ttfb, 50)
                                      - _p(direct_first, 50), 1),
        "http_stream_total_p50_ms": round(_p(http_total, 50), 1),
    }
    print(results["stream"], file=sys.stderr, flush=True)

    # --- non-streaming single request: HTTP vs direct tts() -------------
    http_wall = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        _post(host, port, {"text": TEXT, "voice": "bench"})
        http_wall.append((time.perf_counter() - t0) * 1000)
    direct_wall = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        wav, _, _ = synth.tts(TEXT, emb)
        np.asarray(wav)
        direct_wall.append((time.perf_counter() - t0) * 1000)
    results["single"] = {
        "http_p50_ms": round(_p(http_wall, 50), 1),
        "direct_tts_p50_ms": round(_p(direct_wall, 50), 1),
        "http_overhead_p50_ms": round(_p(http_wall, 50)
                                      - _p(direct_wall, 50), 1),
    }
    print(results["single"], file=sys.stderr, flush=True)

    # --- concurrent clients through the batcher -------------------------
    B = args.concurrent
    before = srv.batcher.stats.batches
    walls = []
    for _ in range(max(3, args.iters // 4)):
        t0 = time.perf_counter()
        threads = [threading.Thread(
            target=_post, args=(host, port,
                                {"text": TEXT[: 40 + 10 * (i % 4)],
                                 "voice": "bench"}))
            for i in range(B)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        walls.append((time.perf_counter() - t0) * 1000)
    n_rounds = len(walls)
    batches_formed = srv.batcher.stats.batches - before
    results["concurrent"] = {
        "clients": B,
        "wall_p50_ms": round(_p(walls, 50), 1),
        "requests_per_s": round(B / (_p(walls, 50) / 1000), 1),
        "batches_per_round": round(batches_formed / n_rounds, 2),
    }
    print(results["concurrent"], file=sys.stderr, flush=True)

    srv.shutdown_serving()
    print(json.dumps(results))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
