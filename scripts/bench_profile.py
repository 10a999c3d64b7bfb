"""Decompose single-utterance synthesis latency on the current device.

Separates, with forced timing (utils/profiling.py — block_until_ready is
not a fence on tunneled backends):
  * host text frontend (normalize + tokenize)
  * encoder / decoder / vocoder device time (marginal, probe-forced)
  * device->host waveform transfer at f32 vs int16
  * the end-to-end tts_ex wall time for reference

This identifies whether the serving path is device-bound or RTT/transfer
bound, and what a fused program / int16 wire format would save.

    python scripts/bench_profile.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TEXT = ("The quick brown fox jumps over the lazy dog while the curious cat "
        "watches from a sunny windowsill in the early morning light.")


def main():
    from zerovox_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from zerovox_tpu.synthesize import MEL_BUCKETS, TEXT_BUCKETS, ZeroVoxTTS, pick_bucket
    from zerovox_tpu.utils.profiling import forced_device_time

    synth = ZeroVoxTTS.from_random(seed=0)
    sr = synth.cfg.audio.sampling_rate
    spkemb = synth.speaker_embed(
        np.random.default_rng(0).normal(size=2 * sr).astype(np.float32) * 0.1)

    # host text frontend
    t0 = time.perf_counter()
    for _ in range(50):
        phone_ids, punct_ids = synth.text2phonemeids(TEXT)
    g2p_ms = (time.perf_counter() - t0) / 50 * 1000
    print(f"host g2p/normalize: {g2p_ms:.2f} ms", file=sys.stderr)

    duration = np.full(len(phone_ids), 6, np.int32)
    phonemes, puncts, mask, dur = synth._prepare_inputs(phone_ids, punct_ids, duration)

    probe = jax.jit(lambda t: jax.tree.leaves(t)[0].ravel()[:1].sum())

    enc = synth._jit_encode_forced(synth._variables, phonemes, puncts, mask, spkemb, dur)
    enc_s = forced_device_time(
        lambda: synth._jit_encode_forced(synth._variables, phonemes, puncts, mask, spkemb, dur),
        lambda e: probe(e["x"]), iters=(3, 13))
    print(f"encoder device: {enc_s * 1000:.2f} ms", file=sys.stderr)

    T_spec = pick_bucket(int(dur.sum()), MEL_BUCKETS)
    mel, _, _ = synth._jit_decode(synth._variables, enc["x"], enc["duration_rounded"],
                                  spkemb, T_spec)
    dec_s = forced_device_time(
        lambda: synth._jit_decode(synth._variables, enc["x"], enc["duration_rounded"],
                                  spkemb, T_spec)[0],
        probe, iters=(3, 13))
    print(f"decoder device (T={T_spec}): {dec_s * 1000:.2f} ms", file=sys.stderr)

    voc_s = forced_device_time(
        lambda: synth._jit_vocode(synth._meldec_variables, mel),
        probe, iters=(3, 13))
    print(f"vocoder device (T={T_spec}): {voc_s * 1000:.2f} ms", file=sys.stderr)

    wav = synth._jit_vocode(synth._meldec_variables, mel)
    to_i16 = jax.jit(lambda w: jnp.clip(w * 32760.0, -32768, 32767).astype(jnp.int16))
    wav_i16 = to_i16(wav)
    jax.device_get(probe(wav_i16).astype(jnp.float32))

    # NOTE: repeated np.asarray of the SAME buffer may be client-cached;
    # defeat it by re-deriving a fresh buffer each iteration
    bump = jax.jit(lambda w, i: w + (i * 0).astype(w.dtype))
    def fetch_fresh(conv, n=6):
        t = 0.0
        for i in range(n):
            fresh = bump(wav, jnp.int32(i))
            fresh = conv(fresh)
            jax.device_get(probe(fresh.astype(jnp.float32) if fresh.dtype == jnp.int16 else fresh))
            t0 = time.perf_counter()
            np.asarray(fresh)
            t += time.perf_counter() - t0
        return t / n

    f32_s = fetch_fresh(lambda w: w)
    i16_s = fetch_fresh(to_i16)
    nbytes = int(np.prod(wav.shape))
    print(f"wav fetch f32 ({nbytes * 4 / 1024:.0f} KiB): {f32_s * 1000:.2f} ms "
          f"({nbytes * 4 / f32_s / 1e6:.1f} MB/s)", file=sys.stderr)
    print(f"wav fetch i16 ({nbytes * 2 / 1024:.0f} KiB): {i16_s * 1000:.2f} ms "
          f"({nbytes * 2 / i16_s / 1e6:.1f} MB/s)", file=sys.stderr)

    # end-to-end reference point
    for _ in range(3):
        synth.tts_ex(TEXT, spkemb, duration=duration, want_mel=False)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        wav_np, mel_len, _, _ = synth.tts_ex(TEXT, spkemb, duration=duration, want_mel=False)
    e2e_s = (time.perf_counter() - t0) / n
    voice = wav_np.shape[0] / sr
    print(f"tts_ex end-to-end: {e2e_s * 1000:.1f} ms for {voice:.2f}s voice "
          f"(rtf {e2e_s / voice:.4f})", file=sys.stderr)
    dev = enc_s + dec_s + voc_s
    print(f"accounted: device {dev * 1000:.1f} ms + f32 fetch {f32_s * 1000:.1f} ms "
          f"+ g2p {g2p_ms:.1f} ms = {dev * 1000 + f32_s * 1000 + g2p_ms:.1f} ms; "
          f"rest is RTT/dispatch ({e2e_s * 1000 - dev * 1000 - f32_s * 1000 - g2p_ms:.1f} ms)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
