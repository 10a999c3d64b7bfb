"""Benchmark harness: RTF + first-chunk latency on the current JAX device.

Methodology mirrors the reference's only perf harness (zerovox/demo.py:100-138):
synthesize one text repeatedly, RTF averaged after a 10-iteration warmup —
reported here as synth_time/voice_len (BASELINE.md convention: target <= 0.05
on one TPU v5e chip). Also measures p50 first-chunk latency of the streaming
path (target < 100 ms). Weights are random (no pretrained artifacts in this
environment); compute cost is identical to trained weights.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_RTF = 0.05  # BASELINE.md target

TEXT = ("The quick brown fox jumps over the lazy dog while the curious cat "
        "watches from a sunny windowsill in the early morning light.")


def _bench_extra_scenarios(synth, sr):
    """BASELINE.md scenario coverage beyond the headline RTF (run with
    --full): German text path, zero-shot multi-speaker batch, StyleTTS
    decoder variant. Results go to stderr; the JSON contract stays one line."""
    import dataclasses

    import jax.numpy as jnp

    from zerovox_tpu.config import ZeroVoxConfig
    from zerovox_tpu.synthesize import ZeroVoxTTS

    # German synthesis path (same single model; normalizer swap)
    synth.language = "de"
    spk = np.asarray(np.zeros((1, 1, synth.cfg.model.emb_size), np.float32))
    t0 = time.perf_counter()
    wav, _, n = synth.tts("Am dreiundzwanzigsten Mai regnete es in Berlin.", spk)
    de_s = time.perf_counter() - t0
    print(f"scenario de: {n} frames in {de_s:.2f}s", file=sys.stderr)
    synth.language = "en"

    # zero-shot cloning: batched multi-speaker synthesis. Random weights
    # predict near-zero durations, so patch the predictions to realistic
    # lengths by synthesizing a long text pair (duration clamping still
    # exercises the real batched pipeline).
    rng = np.random.default_rng(1)
    spk1 = synth.speaker_embed(rng.normal(size=sr).astype(np.float32) * 0.1)
    spk2 = synth.speaker_embed(rng.normal(size=sr).astype(np.float32) * 0.1)
    spkembs = jnp.concatenate([spk1, spk2], axis=0)
    texts = [TEXT, TEXT[: len(TEXT) // 2]]
    outs = synth.tts_batch(texts, spkembs)  # compile
    t0b = time.perf_counter()
    outs = synth.tts_batch(texts, spkembs)
    batch_s = time.perf_counter() - t0b
    voice = sum(n for _, n in outs) * synth.cfg.audio.hop_size / sr
    print(f"scenario batch-cloning: {voice:.2f}s voice in {batch_s:.2f}s "
          f"(rtf {batch_s / max(voice, 1e-9):.4f})", file=sys.stderr)

    # streaming continuity: for glitch-free realtime playback every
    # inter-chunk wall gap must be shorter than the audio the previous
    # chunk carried (ratio < 1); report the worst gap over a paragraph
    para = " ".join([TEXT] * 3)
    n_phones = len(synth.text2phonemeids(para)[0])
    dur = np.full(n_phones, 6, np.int32)
    for _ in range(2):  # warm all programs
        for _ in synth.tts_stream(para, spk_dummy := np.zeros(
                (1, 1, synth.cfg.model.emb_size), np.float32), duration=dur):
            pass
    worst = 0.0
    t_prev = time.perf_counter()
    prev_audio_s = None
    for chunk in synth.tts_stream(para, spk_dummy, duration=dur):
        now = time.perf_counter()
        if prev_audio_s is not None:
            worst = max(worst, (now - t_prev) / prev_audio_s)
        t_prev, prev_audio_s = now, len(chunk) / sr
    print(f"scenario stream-continuity: worst inter-chunk gap = "
          f"{worst:.3f}x chunk audio (must be < 1 for realtime)", file=sys.stderr)

    # StyleTTS decoder variant
    cfg = ZeroVoxConfig()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model,
          decoder=dataclasses.replace(cfg.model.decoder, kind="styletts")))
    synth_sd = ZeroVoxTTS.from_random(cfg, seed=1)
    ids, _ = synth_sd.text2phonemeids(TEXT)
    dur = np.full(len(ids), 6, np.int32)
    synth_sd.tts_ex(TEXT, spk, duration=dur)  # compile
    t0 = time.perf_counter()
    wav, _, n, _ = synth_sd.tts_ex(TEXT, spk, duration=dur)
    sd_s = time.perf_counter() - t0
    voice = n * synth_sd.cfg.audio.hop_size / sr
    print(f"scenario styledec: rtf {sd_s / max(voice, 1e-9):.4f}", file=sys.stderr)


def main():
    from zerovox_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from zerovox_tpu.synthesize import ZeroVoxTTS

    synth = ZeroVoxTTS.from_random(seed=0)
    sr = synth.cfg.audio.sampling_rate

    refwav = np.random.default_rng(0).normal(size=2 * sr).astype(np.float32) * 0.1
    spkemb = synth.speaker_embed(refwav)

    # Random weights predict near-zero durations; force realistic per-phone
    # durations (~70 ms/phone) so the measured programs process a real
    # utterance length. Compute cost is duration-driven, not weight-driven.
    n_phones = len(synth.text2phonemeids(TEXT)[0])
    duration = np.full(n_phones, 6, dtype=np.int32)

    # ---- RTF (reference demo.py methodology, utils/profiling.RtfStats) ----
    from zerovox_tpu.utils.profiling import RtfStats, device_trace

    import contextlib

    profile_dir = None
    if "--profile-dir" in sys.argv:
        profile_dir = sys.argv[sys.argv.index("--profile-dir") + 1]

    stats = RtfStats(warmup=10)
    wav = None
    with device_trace(profile_dir) if profile_dir else contextlib.nullcontext():
        for i in range(25):
            t0 = time.perf_counter()
            wav, _, _, _ = synth.tts_ex(TEXT, spkemb, duration=duration)
            stats.add(wav.shape[0] / sr, time.perf_counter() - t0)
    rtf = stats.mean_rtf

    # ---- p50 first-chunk latency (streaming) ----
    lat_stats = RtfStats(warmup=4)
    for i in range(15):
        t0 = time.perf_counter()
        gen = synth.tts_stream(TEXT, spkemb, duration=duration)
        next(gen)
        first = time.perf_counter() - t0
        for _ in gen:
            pass
        lat_stats.add(wav.shape[0] / sr, time.perf_counter() - t0,
                      first_chunk_s=first)
    p50_ms = lat_stats.p50_first_chunk_ms

    if "--full" in sys.argv:
        _bench_extra_scenarios(synth, sr)

    print(f"voice_len={wav.shape[0] / sr:.2f}s rtf={rtf:.4f} "
          f"(x{1 / max(rtf, 1e-9):.1f} realtime) first_chunk_p50={p50_ms:.1f}ms",
          file=sys.stderr)

    print(json.dumps({
        "metric": "single-chip synthesis RTF (synth_time/voice_len, tts_medium config)",
        "value": round(rtf, 5),
        "unit": "ratio (lower is better; baseline target 0.05)",
        "vs_baseline": round(BASELINE_RTF / max(rtf, 1e-9), 3),
        "first_chunk_p50_ms": round(p50_ms, 1),
    }))


if __name__ == "__main__":
    main()
