"""Zero-shot speaker-cloning convergence experiment (VERDICT r2 missing #1).

The reference's defining capability is learning speaker identity from a
random same-utterance ref-mel crop (zerovox/tts/data.py:72-79) so that an
unseen wav drives the output voice at inference
(zerovox/tts/synthesize.py:123-143). Round-2 convergence was proven on a
single-voice corpus, which cannot distinguish real conditioning from a
learned constant. This experiment closes that gap:

  1. --gen: fabricate a MULTI-VOICE tone-speak corpus — 4 VoiceSpec
     speakers (distinct F0 register, harmonic timbre, vibrato;
     zerovox_tpu/utils/synthvoice.py) x N shared texts — writing the
     preprocessed feature store directly from exact render boundaries
     (ground-truth durations; analytic per-phone pitch = char_f0 *
     voice.f0_scale). Held-out texts are rendered per voice as (a)
     reference wavs never seen in training and (b) eval mel targets.
  2. --train: run the real `zerovox_tpu.cli.train` CLI on it (ref-mel-crop
     conditioning exactly as in production training).
  3. --eval: for each voice, embed an UNSEEN reference wav, synthesize
     held-out texts with teacher durations, and measure:
       * mel identity: L1 to the same text rendered in the conditioning
         voice vs in each other voice (margin + nearest-voice accuracy);
       * F0 transfer: the pitch predictor's (denormalized) output vs the
         conditioning voice's true F0 ladder vs the other voices';
       * speaker-embedding clustering: intra- vs inter-voice cosine.

A model that ignores the reference scores ~chance (0.25 accuracy, margin
~1.0); identity transfer shows accuracy 1.0 and margins >> 1.

    python scripts/exp_cloning.py --work /tmp/zvx_cloning --accelerator tpu \
        --epochs 150 --all
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from zerovox_tpu.utils.synthvoice import (VoiceSpec, char_f0_voice,
                                          render_text_with_boundaries)

SR = 22050
HOP = 256
PHONES = "'-abcdefghijklmnopqrstuvwxyz"
PUNCTS = " ,.;:-!?\""

# Four synthetic speakers with speech-like statistics: a NARROW exponential
# content ladder (1 octave across the alphabet, as prosody within a
# speaker) and WIDE voice registers (3.8x = ~1.9 octaves across speakers,
# f0_scale 0.55..2.1) plus distinct harmonic timbre/vibrato. The first
# corpus design (linear 115 Hz ladder = 4.4 content octaves, registers only
# 1.5x) buried the voice signal under the pitch normalization + 64-bin
# variance quantization: a voice shifted normalized pitch by ~1.5 bins and
# the voice-blind pitch-loss floor was ~6e-4, so conditioning had almost no
# gradient (documented in docs/CONVERGENCE.md).
_LADDER = (220.0, 1.0)
VOICES = {
    "bass": VoiceSpec("bass", f0_scale=0.55, ladder=_LADDER,
                      harmonic_amps=(0.60, 0.12, 0.04, 0.015), tilt=-0.4,
                      vibrato_rate=4.5, vibrato_depth=0.008),
    "tenor": VoiceSpec("tenor", f0_scale=0.85, ladder=_LADDER,
                       harmonic_amps=(0.50, 0.15, 0.07, 0.03), tilt=0.0,
                       vibrato_rate=5.0, vibrato_depth=0.010),
    "mezzo": VoiceSpec("mezzo", f0_scale=1.35, ladder=_LADDER,
                       harmonic_amps=(0.35, 0.30, 0.18, 0.08), tilt=0.25,
                       vibrato_rate=5.5, vibrato_depth=0.013),
    "soprano": VoiceSpec("soprano", f0_scale=2.10, ladder=_LADDER,
                         harmonic_amps=(0.22, 0.30, 0.26, 0.16), tilt=0.45,
                         vibrato_rate=6.2, vibrato_depth=0.016),
}

N_TRAIN_TEXTS = 28
N_EVAL_TEXTS = 4  # text 0 -> unseen reference wav; texts 1..3 -> synthesis eval


def gen_texts(n: int, seed: int) -> list[str]:
    rng = np.random.default_rng(seed)
    alpha = list("abcdefghijklmnopqrstuvwxyz")
    texts = []
    for _ in range(n):
        nw = int(rng.integers(3, 6))
        words = ["".join(rng.choice(alpha, size=int(rng.integers(3, 7))))
                 for _ in range(nw)]
        texts.append(" ".join(words))
    return texts


def render_features(text: str, voice: VoiceSpec, seed: int):
    """Render and featurize one utterance with exact ground truth.

    Returns dict(wav, mel[T, n_mels], energy[T], durations[L],
    phone_pitch[L], phone_energy[L]) where durations come from exact render
    boundaries (inter-char silence split half/half to neighbors, reference
    utils/preprocess.py:505-516 discipline) and sum(durations) == T.
    """
    from zerovox_tpu.dsp.mels import get_mel_from_wav
    from zerovox_tpu.dsp.pitch import phoneme_level_average

    wav, bounds = render_text_with_boundaries(text, SR, seed=seed, voice=voice)
    s0 = bounds[0][1]
    wav = wav[s0 : bounds[-1][2]]

    # char spans in cropped samples, silences split half/half to neighbors
    starts = np.array([b[1] - s0 for b in bounds], np.float64)
    ends = np.array([b[2] - s0 for b in bounds], np.float64)
    mids = (ends[:-1] + starts[1:]) / 2.0
    edges = np.concatenate([[0.0], mids, [len(wav)]])
    hop_edges = np.round(edges / HOP).astype(np.int64)
    durations = np.diff(hop_edges)

    mel, energy = get_mel_from_wav(
        audio=wav, sampling_rate=SR, fft_size=1024, hop_size=HOP,
        win_length=1024, num_mels=80, fmin=0, fmax=8000)

    durations = durations.copy()
    durations[-1] += mel.shape[1] - durations.sum()
    assert durations.min() > 0

    phone_pitch = np.array(
        [char_f0_voice(b[0], voice) for b in bounds], np.float32)
    phone_energy = phoneme_level_average(energy, durations).astype(np.float32)
    return {"wav": wav, "mel": mel.T.astype(np.float32),
            "energy": energy, "durations": durations.astype(np.int64),
            "phone_pitch": phone_pitch, "phone_energy": phone_energy}


def modelcfg_dict():
    return {
        "audio": {"sampling_rate": SR, "fft_size": 1024, "hop_size": HOP,
                  "win_length": 1024, "num_mels": 80, "fmin": 0, "fmax": 8000},
        "model": {
            "max_txt_len": 64, "min_mel_len": 50, "max_mel_len": 1024,
            "phones": PHONES, "puncts": PUNCTS,
            "emb_dim": 64, "punct_emb_dim": 16,
            "encoder": {"fs2_layer": 2, "fs2_head": 2, "vp_filter_size": 32,
                        "ve_n_bins": 64},
            "decoder": {"kind": "fastspeech2", "n_layers": 2, "n_head": 2,
                        "conv_filter_size": 128, "conv_kernel_size": [9, 1],
                        "dropout": 0.1, "scln": True},
            "resnet": {"layers": [1, 1, 1, 1], "num_filters": [16, 32, 32, 64],
                       "encoder_type": "ASP"},
        },
        "training": {"learning_rate": 2e-3},
    }


def phase_gen(work: str):
    from zerovox_tpu.dsp.audio import save_wav
    from zerovox_tpu.symbols import Symbols
    from zerovox_tpu.text.tokenizer import transcript2phonemids

    symbols = Symbols(PHONES, PUNCTS)
    pp = os.path.join(work, "pp", "cloning")
    for d in ["mel", "pitch", "energy", "duration", "wavs"]:
        os.makedirs(os.path.join(pp, d), exist_ok=True)
    refs_dir = os.path.join(work, "refs")
    os.makedirs(refs_dir, exist_ok=True)

    train_texts = gen_texts(N_TRAIN_TEXTS, seed=11)
    eval_texts = gen_texts(N_EVAL_TEXTS, seed=99)

    lines = []
    pmin, pmax = np.inf, -np.inf
    emin, emax = np.inf, -np.inf
    for vi, (vname, voice) in enumerate(VOICES.items()):
        for ti, text in enumerate(train_texts):
            base = f"{vname}_{ti:03d}"
            ft = render_features(text, voice, seed=1000 * vi + ti)
            np.save(os.path.join(pp, "mel", f"mel-{base}.npy"), ft["mel"])
            np.save(os.path.join(pp, "pitch", f"pitch-{base}.npy"), ft["phone_pitch"])
            np.save(os.path.join(pp, "energy", f"energy-{base}.npy"), ft["phone_energy"])
            np.save(os.path.join(pp, "duration", f"duration-{base}.npy"), ft["durations"])
            with open(os.path.join(pp, "mel", f"startstop-{base}.json"), "w") as f:
                json.dump({"start_hop": 0, "end_hop": int(ft["mel"].shape[0])}, f)
            pids, puncts = transcript2phonemids(text, symbols)
            assert len(pids) == len(ft["durations"])
            lines.append(f"{base}.wav|{','.join(map(str, pids))}|"
                         f"{','.join(map(str, puncts))}|{text}")
            pmin, pmax = min(pmin, ft["phone_pitch"].min()), max(pmax, ft["phone_pitch"].max())
            emin, emax = min(emin, ft["phone_energy"].min()), max(emax, ft["phone_energy"].max())

        # held-out utterances: never in train.txt
        for ei, text in enumerate(eval_texts):
            wav, _ = render_text_with_boundaries(text, SR, seed=7000 + 100 * vi + ei,
                                                 voice=voice)
            save_wav(os.path.join(refs_dir, f"{vname}_ref{ei}.wav"), wav, SR)

    with open(os.path.join(pp, "train.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(pp, "stats.json"), "w") as f:
        json.dump({"pitch": [float(pmin), float(pmax)],
                   "energy": [float(emin), float(emax)]}, f)

    with open(os.path.join(work, "modelcfg.yaml"), "w") as f:
        yaml.dump(modelcfg_dict(), f)
    with open(os.path.join(work, "corpus.yaml"), "w") as f:
        yaml.dump({"dataset": "cloning", "language": "en",
                   "path": {"corpus_path": os.path.join(work, "corpus"),
                            "preprocessed_path": "cloning"}}, f)
    with open(os.path.join(work, "texts.json"), "w") as f:
        json.dump({"train": train_texts, "eval": eval_texts}, f)
    print(f"corpus: {len(lines)} utterances "
          f"({len(VOICES)} voices x {len(train_texts)} texts), "
          f"pitch range {pmin:.0f}-{pmax:.0f} Hz")


def phase_train(work: str, accelerator: str, epochs: int, batch_size: int):
    env = dict(os.environ)
    env["ZEROVOX_PREPROCESSED_DATA_PATH"] = os.path.join(work, "pp")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "-m", "zerovox_tpu.cli.train",
           "-c", os.path.join(work, "modelcfg.yaml"),
           os.path.join(work, "corpus.yaml"),
           "--out-folder", os.path.join(work, "model"),
           "--accelerator", accelerator, "--devices", "1",
           "--batch-size", str(batch_size), "--max-epochs", str(epochs),
           "--warmup-epochs", "5", "--num_workers", "1",
           "--checkpoint-every-n-epochs", str(max(1, epochs // 20))]
    print("+", " ".join(cmd), flush=True)
    log = os.path.join(work, "train.log")
    with open(log, "w") as f:
        p = subprocess.run(cmd, env=env, stdout=f, stderr=subprocess.STDOUT,
                           cwd=REPO, text=True)
    tail = open(log).read()
    sys.stdout.write(tail[-3000:])
    if p.returncode != 0:
        raise RuntimeError(f"training failed rc={p.returncode}, see {log}")


def _denorm_pitch(x: np.ndarray, stats: dict) -> np.ndarray:
    """Invert the log-min-max normalization (training/data.py:115-116)."""
    return (np.exp(x * np.log(stats["pitch_max"] - stats["pitch_min"] + 1.0))
            + stats["pitch_min"] - 1.0)


def phase_eval(work: str, accelerator: str) -> dict:
    import jax

    if accelerator == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from zerovox_tpu.config import ZeroVoxConfig
    from zerovox_tpu.dsp.audio import load_wav
    from zerovox_tpu.dsp.mels import get_mel_from_wav
    from zerovox_tpu.models.zerovox import ZeroVox
    from zerovox_tpu.symbols import Symbols
    from zerovox_tpu.text.tokenizer import transcript2phonemids
    from zerovox_tpu.training.checkpointing import load_native_checkpoint
    from zerovox_tpu.training.data import MEL_BUCKETS, PHONEME_BUCKETS, _bucket

    with open(os.path.join(work, "model", "modelcfg.yaml")) as f:
        modelcfg = yaml.load(f, Loader=yaml.FullLoader)
    stats = modelcfg["stats"]
    cfg = ZeroVoxConfig.from_dict(modelcfg)
    symbols = Symbols(PHONES, PUNCTS)
    ckpt_dir = os.path.join(work, "model", "checkpoints")
    newest = sorted(f for f in os.listdir(ckpt_dir) if f.endswith(".msgpack"))[-1]
    variables = load_native_checkpoint(os.path.join(ckpt_dir, newest))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    model = ZeroVox(cfg)
    with open(os.path.join(work, "texts.json")) as f:
        eval_texts = json.load(f)["eval"]

    def ref_mel_of(path):
        # trim edge silence like the serving path does (ZeroVoxTTS.
        # speaker_embed: librosa-style trim top_db=40) — training ref crops
        # are speech-only mel slices, so untrimmed silence would wash out
        # the embedding
        wav, _ = load_wav(path, target_sr=SR)
        amp = np.abs(wav)
        thr = amp.max() * 10 ** (-40 / 20)
        nz = np.flatnonzero(amp > thr)
        wav = wav[nz[0]: nz[-1] + 1]
        mel, _ = get_mel_from_wav(audio=wav, sampling_rate=SR, fft_size=1024,
                                  hop_size=HOP, win_length=1024, num_mels=80,
                                  fmin=0, fmax=8000)
        return mel.T[None].astype(np.float32)

    # speaker embeddings from UNSEEN reference wavs (2 per voice)
    embs = {}
    for vname in VOICES:
        embs[vname] = [np.asarray(model.apply(
            variables, ref_mel_of(os.path.join(work, "refs", f"{vname}_ref{e}.wav")),
            train=False, method=ZeroVox.speaker_embed))[0, 0] for e in (0, 1)]

    # embedding clustering: intra- vs inter-voice cosine
    def cos(a, b):
        return float(np.dot(a, b))  # embeddings are L2-normalized

    intra = [cos(embs[v][0], embs[v][1]) for v in VOICES]
    inter = [cos(embs[v][0], embs[w][0])
             for v in VOICES for w in VOICES if v != w]

    # synthesis conditioned on each voice's unseen ref0, teacher durations
    results = []
    for text_i, text in enumerate(eval_texts[1:], start=1):
        pids, puncts = transcript2phonemids(text, symbols)
        # durations/targets per candidate voice (same durations for all
        # voices: char timing is voice-independent by construction)
        targets = {v: render_features(text, VOICES[v], seed=500 + text_i)
                   for v in VOICES}
        dur = next(iter(targets.values()))["durations"]
        n_frames = int(dur.sum())
        L = _bucket(len(pids), PHONEME_BUCKETS)
        T = _bucket(n_frames, MEL_BUCKETS)

        batch = {
            "phoneme": np.zeros((1, L), np.int32),
            "puncts": np.zeros((1, L), np.int32),
            "phoneme_mask": np.arange(L)[None] >= len(pids),
            "pitch": np.zeros((1, L), np.float32),
            "energy": np.zeros((1, L), np.float32),
            "duration": np.zeros((1, L), np.int32),
            "mel_mask": np.arange(T)[None] >= n_frames,
        }
        batch["phoneme"][0, : len(pids)] = pids
        batch["puncts"][0, : len(pids)] = puncts
        batch["duration"][0, : len(pids)] = dur

        for vname in VOICES:
            spk = np.stack([embs[vname][0]])[:, None]  # [1,1,emb]
            # run encoder + variance adaptor + decoder with the unseen-wav
            # style embedding (the bucketed serving path's two stages)
            enc = model.apply(variables, batch["phoneme"], batch["puncts"], spk,
                              batch["phoneme_mask"], batch["duration"],
                              method=ZeroVox.encode)
            mel, _, _ = model.apply(variables, enc["x"], batch["duration"],
                                    spk, T, method=ZeroVox.decode)
            mel = np.asarray(mel)[0, :n_frames]
            pred_pitch = np.asarray(enc["pitch"])[0, : len(pids)]

            l1 = {w: float(np.abs(mel - targets[w]["mel"][:n_frames]).mean())
                  for w in VOICES}
            hz = _denorm_pitch(pred_pitch, stats)
            err = {w: float(np.mean(np.abs(
                hz - targets[w]["phone_pitch"]) / targets[w]["phone_pitch"]))
                for w in VOICES}
            results.append({"text": text_i, "ref_voice": vname, "l1": l1,
                            "nearest": min(l1, key=l1.get),
                            "pitch_relerr": err,
                            "pitch_nearest": min(err, key=err.get)})

    acc = np.mean([r["nearest"] == r["ref_voice"] for r in results])
    margins = [np.mean([r["l1"][w] for w in VOICES if w != r["ref_voice"]])
               / max(r["l1"][r["ref_voice"]], 1e-9) for r in results]
    summary = {
        "checkpoint": newest,
        "n_eval": len(results),
        "mel_identity_accuracy": float(acc),
        "mel_margin_other_over_self": float(np.mean(margins)),
        "pitch_identity_accuracy": float(np.mean(
            [r["pitch_nearest"] == r["ref_voice"] for r in results])),
        "emb_cos_intra": float(np.mean(intra)),
        "emb_cos_inter": float(np.mean(inter)),
        "results": results,
    }
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/zvx_cloning")
    ap.add_argument("--accelerator", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--gen", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    if args.gen or args.all:
        phase_gen(args.work)
    if args.train or args.all:
        phase_train(args.work, args.accelerator, args.epochs, args.batch_size)
    if args.eval or args.all:
        summary = phase_eval(args.work, args.accelerator)
        print(json.dumps({k: v for k, v in summary.items() if k != "results"},
                         indent=2))
        out = args.out_json or os.path.join(args.work, "cloning_eval.json")
        with open(out, "w") as f:
            json.dump(summary, f, indent=2)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
