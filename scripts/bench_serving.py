"""Batch-serving throughput: utterances/sec and per-stream RTF vs batch size.

The reference has no batch path at all (single-utterance `tts`,
zerovox/tts/synthesize.py:241); `tts_batch` is a new capability, so these
numbers define the framework's own serving envelope on one chip. Timing is
wall-clock around the full call including the device->host waveform fetch —
exactly what a serving process experiences.

    python scripts/bench_serving.py [--batches 1,2,4,8] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TEXT = ("The quick brown fox jumps over the lazy dog while the curious cat "
        "watches from a sunny windowsill in the early morning light.")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out-json", default=None)
    ap.add_argument("--eager-bytes", type=int, default=None,
                    help="override ZeroVoxTTS._BATCH_EAGER_FETCH_BYTES to A/B "
                         "the tts_batch fetch policy (0 = always trim+wait, "
                         "huge = always eager padded fetch)")
    ap.add_argument("--frames-per-phone", type=int, default=None,
                    help="teacher-force this many mel frames per phone "
                         "(random weights predict ~zero durations; 6 ≈ real "
                         "speech, making the measured programs process a "
                         "realistic utterance length — same convention as "
                         "bench.py)")
    args = ap.parse_args()

    from zerovox_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from zerovox_tpu.synthesize import ZeroVoxTTS

    synth = ZeroVoxTTS.from_random(seed=0)
    if args.eager_bytes is not None:
        type(synth)._BATCH_EAGER_FETCH_BYTES = args.eager_bytes
    sr = synth.cfg.audio.sampling_rate
    hop = synth.cfg.audio.hop_size
    rng = np.random.default_rng(0)

    rows = []
    for B in [int(b) for b in args.batches.split(",")]:
        spkembs = jnp.concatenate(
            [synth.speaker_embed(rng.normal(size=2 * sr).astype(np.float32) * 0.1)
             for _ in range(B)], axis=0)
        # vary text lengths across the batch like real traffic
        texts = [TEXT[: len(TEXT) * (i % 4 + 5) // 8] for i in range(B)]
        # without --frames-per-phone: random weights predict ~zero durations;
        # tts_batch uses predictions, which exercises the real ragged-batch
        # path but at degenerate (near-empty) mel lengths. With it: teacher-
        # forced realistic lengths, the representative serving workload.
        kw = {}
        if args.frames_per_phone:
            kw["durations"] = [
                np.full(len(synth.text2phonemeids(t.strip())[0]),
                        args.frames_per_phone, np.int32) for t in texts]
        outs = synth.tts_batch(texts, spkembs, **kw)  # compile
        outs = synth.tts_batch(texts, spkembs, **kw)  # warm

        t0 = time.perf_counter()
        for _ in range(args.iters):
            outs = synth.tts_batch(texts, spkembs, **kw)
        dt = (time.perf_counter() - t0) / args.iters
        voice_s = sum(n for _, n in outs) * hop / sr
        rows.append({
            "batch": B,
            "wall_ms_per_batch": round(dt * 1000, 1),
            "utterances_per_s": round(B / dt, 2),
            "voice_seconds_per_batch": round(voice_s, 2),
            "rtf_aggregate": round(dt / max(voice_s, 1e-9), 4),
        })
        print(rows[-1], file=sys.stderr, flush=True)

    print(json.dumps({"rows": rows}))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
