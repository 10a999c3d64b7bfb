"""Deterministic synthetic "tone-speak" voice.

Renders romanized text as audio where every character is a fixed harmonic
tone (semitone ladder over the alphabet) with a smooth per-character
envelope, vibrato, and a noise floor. Spaces render as silence.

Why this exists: the reference ships 68 recorded speaker wavs
(zerovox/tts/refaudio/) as demo voices and uses real corpora for training;
this zero-egress build needs a generated stand-in that is

  * deterministic (same text -> same waveform),
  * *learnable* (text fully determines the mel target, so a training run
    on a tone-speak corpus must converge),
  * *alignable* (exact per-character sample boundaries are known, giving
    ground truth for forced-alignment tests), and
  * usable as out-of-box demo reference audio.

Used by: scripts/verify_pipeline.py (pipeline + convergence runs),
tests for CTC alignment, and the bundled refaudio generation.
"""

from __future__ import annotations

import hashlib

import numpy as np

ALPHABET = "abcdefghijklmnopqrstuvwxyz'"


def char_f0(c: str) -> float:
    """Fundamental for a character: linear ladder, 115 Hz apart.

    Linear (not semitone) spacing so adjacent characters stay separable at
    the ~40 Hz frequency resolution of a 25 ms analysis window — the CTC
    alignment model (preprocess/tone_ctc.py) must be able to identify the
    sounding character from a single mel frame.
    """
    idx = ALPHABET.find(c)
    if idx < 0:
        idx = len(ALPHABET)
    return 220.0 + 115.0 * idx


def char_duration(c: str, base: float = 0.14) -> float:
    """Deterministic per-character duration in seconds (0.75x..1.5x base)."""
    h = int(hashlib.md5(c.encode()).hexdigest(), 16) % 1000 / 1000.0
    return base * (0.75 + 0.75 * h)


def render_text_with_boundaries(
    text: str,
    sample_rate: int = 22050,
    char_dur: float = 0.14,
    edge_silence: float = 0.25,
    # keep the noise floor well under the preprocessing silence-trim
    # threshold (amplitude 0.004) so edge silence trims deterministically
    noise: float = 0.001,
    seed: int = 0,
):
    """Render text; returns (wav[float32], boundaries).

    boundaries: list of (char, start_sample, end_sample) for every
    non-space character — exact ground truth for alignment tests.
    """
    rng = np.random.default_rng(seed)
    pieces = [np.zeros(int(edge_silence * sample_rate), np.float32)]
    boundaries: list[tuple[str, int, int]] = []
    cursor = len(pieces[0])

    for c in text.lower():
        if c == " ":
            seg = np.zeros(int(0.06 * sample_rate), np.float32)
        else:
            dur = char_duration(c, char_dur)
            n = int(dur * sample_rate)
            t = np.arange(n) / sample_rate
            f0 = char_f0(c)
            vib = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t)
            phase = 2 * np.pi * f0 * vib * t
            seg = (0.5 * np.sin(phase)
                   + 0.15 * np.sin(2 * phase)
                   + 0.07 * np.sin(3 * phase)).astype(np.float32)
            # smooth attack/release so character edges aren't clicks
            ramp = min(n // 4, int(0.02 * sample_rate))
            env = np.ones(n, np.float32)
            env[:ramp] = np.linspace(0, 1, ramp)
            env[-ramp:] = np.linspace(1, 0, ramp)
            seg *= 0.35 * env
            boundaries.append((c, cursor, cursor + n))
        pieces.append(seg)
        cursor += len(seg)

    pieces.append(np.zeros(int(edge_silence * sample_rate), np.float32))
    wav = np.concatenate(pieces)
    if noise > 0:
        wav = wav + rng.normal(size=wav.shape).astype(np.float32) * noise
    return wav.astype(np.float32), boundaries


def render_text(text: str, sample_rate: int = 22050, **kw) -> np.ndarray:
    wav, _ = render_text_with_boundaries(text, sample_rate, **kw)
    return wav


def make_corpus(root, texts, sample_rate: int = 22050, seed: int = 0) -> str:
    """Write an LJSpeech-layout corpus (metadata.csv 'base|text' + wavs/)."""
    import os

    from zerovox_tpu.dsp.audio import save_wav

    wavdir = os.path.join(str(root), "wavs")
    os.makedirs(wavdir, exist_ok=True)
    lines = []
    for i, text in enumerate(texts):
        base = f"tone{i:03d}"
        wav = render_text(text, sample_rate, seed=seed + i)
        save_wav(os.path.join(wavdir, f"{base}.wav"), wav, sample_rate)
        lines.append(f"{base}|{text}")
    with open(os.path.join(str(root), "metadata.csv"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return str(root)
