"""Generate the bundled out-of-box speaker-reference wavs.

The reference distribution ships 68 recorded speaker wavs
(zerovox/tts/refaudio/) so `zerovox-demo` works with zero setup; this
zero-egress build generates synthetic speech-like voices instead: a glottal
pulse-train source (declining F0 with jitter/vibrato) through vowel formant
resonators with syllabic amplitude envelopes and soft noise "consonants".
Not intelligible speech — it exists so the speaker-embedding path has a
plausible voiced, formanted, 22.05 kHz signal out of the box.

The rendering lives in zerovox_tpu.utils.synthvoice (formant_voice_with_f0),
shared with the pitch-tracker validation battery, which uses the exact
instantaneous-F0 ground truth the renderer returns.

    python scripts/gen_refaudio.py   # writes the bundled voice set
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from zerovox_tpu.utils.synthvoice import formant_voice_with_f0  # noqa: E402

SR = 22050

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
    wav, _, _ = formant_voice_with_f0(f0_base, formant_scale, vowel_seq, seed,
                                      sample_rate=SR)
    out_path = os.path.join(out_dir, f"{name}.wav")
    from zerovox_tpu.dsp.audio import save_wav

    save_wav(out_path, wav, SR)
    print(f"wrote {out_path}: {len(wav) / SR:.2f}s")
    return out_path


def main(out_dir: str | None = None) -> list[str]:
    out_dir = out_dir or os.path.join(REPO, "zerovox_tpu", "refaudio")
    return [gen_voice(name, *spec, out_dir=out_dir)
            for name, spec in VOICES.items()]


if __name__ == "__main__":
    main()
