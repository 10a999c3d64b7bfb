"""Generate the bundled out-of-box speaker-reference wav.

The reference distribution ships 68 recorded speaker wavs
(zerovox/tts/refaudio/) so `zerovox-demo` works with zero setup; this
zero-egress build generates a synthetic speech-like voice instead: a glottal
pulse-train source (declining F0 with jitter/vibrato) through vowel formant
resonators with syllabic amplitude envelopes and soft noise "consonants".
Not intelligible speech — it exists so the speaker-embedding path has a
plausible voiced, formanted, 22.05 kHz signal out of the box.

    python scripts/gen_refaudio.py   # writes the bundled voice set
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SR = 22050

# (F1, F2, F3) vowel formants, male-ish
VOWELS = {
    "a": (730, 1090, 2440),
    "e": (530, 1840, 2480),
    "i": (270, 2290, 3010),
    "o": (570, 840, 2410),
    "u": (300, 870, 2240),
}


def _resonator_mag(freqs: np.ndarray, fc: float, bw: float) -> np.ndarray:
    """Magnitude response of a formant resonance (Lorentzian-ish)."""
    return 1.0 / np.sqrt(1.0 + ((freqs - fc) / (bw / 2)) ** 2)


def syllable(vowel: str, dur: float, f0: float, rng: np.random.Generator,
             formant_scale: float = 1.0) -> np.ndarray:
    n = int(dur * SR)
    t = np.arange(n) / SR
    # source: harmonic stack with 1/h rolloff, vibrato + jitter
    vib = 1.0 + 0.015 * np.sin(2 * np.pi * 5.5 * t) + 0.01 * rng.normal(size=n).cumsum() / n
    phase = np.cumsum(2 * np.pi * f0 * vib / SR)
    src = np.zeros(n)
    for h in range(1, int(4000 / f0)):
        src += np.sin(h * phase) / h
    # shape the spectrum with vowel formants via FFT filtering
    spec = np.fft.rfft(src)
    freqs = np.fft.rfftfreq(n, 1 / SR)
    mag = np.zeros_like(freqs)
    for fc, bw in zip((f * formant_scale for f in VOWELS[vowel]), (90, 110, 170)):
        mag += _resonator_mag(freqs, fc, bw)
    mag += 0.05  # spectral floor
    out = np.fft.irfft(spec * mag, n)
    # syllabic envelope
    env = np.minimum(1.0, np.minimum(t / 0.04, (dur - t) / 0.08) / 1.0)
    out = out * np.clip(env, 0, 1)
    # breathy noise floor
    out += 0.01 * rng.normal(size=n) * np.clip(env, 0, 1)
    return out


def consonant(dur: float, rng: np.random.Generator) -> np.ndarray:
    """Soft high-passed noise burst."""
    n = int(dur * SR)
    noise = rng.normal(size=n)
    spec = np.fft.rfft(noise)
    freqs = np.fft.rfftfreq(n, 1 / SR)
    spec *= np.clip((freqs - 1500) / 3000, 0, 1)
    out = np.fft.irfft(spec, n)
    env = np.sin(np.linspace(0, np.pi, n))
    return 0.25 * out * env


# bundled voice set: (base F0 Hz, formant scale, vowel sequence, seed).
# Names mirror the reference's refaudio naming convention (lang_name.wav);
# formant scale ~1.15 approximates a shorter (female-ish) vocal tract.
VOICES = {
    "en_kevin": (118.0, 1.00, "aeiouaoieuaoeiau", 20240816),
    "en_linda": (205.0, 1.16, "ieaouaeioueaioau", 20240817),
    "en_ryan": (98.0, 0.95, "oauieaouaieoaueo", 20240818),
    "de_kerstin": (195.0, 1.14, "euioaueaoiueaoiu", 20240819),
    "de_thorsten": (110.0, 0.98, "aoueiaoeuiaoueia", 20240820),
}


def gen_voice(name: str, f0_base: float, formant_scale: float,
              vowel_seq: str, seed: int, out_dir: str) -> str:
    rng = np.random.default_rng(seed)
    pieces = [np.zeros(int(0.15 * SR))]
    f0 = f0_base
    for k, v in enumerate(vowel_seq):
        dur = 0.16 + 0.10 * rng.random()
        pieces.append(syllable(v, dur, f0, rng, formant_scale))
        f0 *= 0.995  # declination
        if k % 3 == 2:
            pieces.append(consonant(0.05 + 0.03 * rng.random(), rng))
        if k % 5 == 4:
            pieces.append(np.zeros(int(0.12 * SR)))
            f0 = f0_base * (0.97 + 0.06 * rng.random())
    pieces.append(np.zeros(int(0.15 * SR)))

    wav = np.concatenate(pieces)
    wav = wav / np.abs(wav).max() * 0.35

    out_path = os.path.join(out_dir, f"{name}.wav")
    from zerovox_tpu.dsp.audio import save_wav

    save_wav(out_path, wav.astype(np.float32), SR)
    print(f"wrote {out_path}: {len(wav) / SR:.2f}s")
    return out_path


def main(out_dir: str | None = None) -> list[str]:
    out_dir = out_dir or os.path.join(REPO, "zerovox_tpu", "refaudio")
    return [gen_voice(name, *spec, out_dir=out_dir)
            for name, spec in VOICES.items()]


if __name__ == "__main__":
    main()
