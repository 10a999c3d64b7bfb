"""Render listening copies through an in-repo-trained HiFi-GAN vocoder.

Takes the Griffin-Lim listening pairs `exp_real_speech.py --eval` wrote
(`<work>/listen/*_gt.wav`, `*_synth.wav`), recomputes each wav's log-mel
with the training frontend (dsp/mels.py contract), and vocodes it with a
`zerovox-train-vocoder` artifact (config.json + generator.msgpack):

  * `*_gt_voc.wav`    — copy-synthesis of REAL held-out speech: the
    direct quality check of the trained vocoder on never-trained voices;
  * `*_synth_voc.wav` — the TTS renderings re-vocoded from the mel of
    their Griffin-Lim render (GL preserves the magnitude spectrogram, so
    this is the synthesized mel modulo the GL round trip).

CPU-friendly (a few seconds of audio through the generator); no TPU
required:

    JAX_PLATFORMS=cpu python scripts/vocode_listen.py \
        --listen /tmp/zvx_real5/listen --vocoder /tmp/zvx_voc5
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--listen", required=True,
                    help="exp_real_speech listen dir (the *_gt/_synth wavs)")
    ap.add_argument("--vocoder", required=True,
                    help="zerovox-train-vocoder out dir "
                         "(config.json + generator.msgpack)")
    ap.add_argument("--sr", type=int, default=22050)
    args = ap.parse_args()

    from zerovox_tpu.dsp.audio import load_wav, save_wav
    from zerovox_tpu.dsp.mels import get_mel_from_wav
    from zerovox_tpu.models.hifigan import MelDec
    from zerovox_tpu.synthesize import ZeroVoxTTS

    cfg, variables = ZeroVoxTTS._load_meldec(args.vocoder, verbose=True)
    md = MelDec(cfg)

    wavs = sorted(glob.glob(os.path.join(args.listen, "*_gt.wav"))) + \
        sorted(glob.glob(os.path.join(args.listen, "*_synth.wav")))
    if not wavs:
        raise SystemExit(f"no listening wavs under {args.listen}")
    for p in wavs:
        wav, _ = load_wav(p, target_sr=cfg.sampling_rate)
        mel, _ = get_mel_from_wav(
            audio=wav, sampling_rate=cfg.sampling_rate, fft_size=1024,
            hop_size=256, win_length=1024, num_mels=cfg.num_mels,
            fmin=0.0, fmax=8000.0)  # [M, T], training frontend params
        y = np.asarray(md.apply(variables, np.asarray(mel).T[None],
                                normalize_before=True))[0]
        out = p[:-4] + "_voc.wav"
        save_wav(out, y, cfg.sampling_rate)
        print(f"{os.path.basename(p)} -> {os.path.basename(out)} "
              f"({len(y) / cfg.sampling_rate:.2f}s)")


if __name__ == "__main__":
    main()
