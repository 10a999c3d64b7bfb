"""Held-out-SPEAKER zero-shot cloning experiment (VERDICT r3 task #1).

Round-3's cloning proof (scripts/exp_cloning.py, docs/CONVERGENCE.md)
evaluated with unseen *wavs* of the 4 *training* voices — that proves the
embedding conditions synthesis, not that the speaker space generalizes.
With 4 training voices the encoder could be a 4-way classifier and still
score 12/12. This experiment tests the actual zero-shot contract
(reference zerovox/tts/synthesize.py:123-143 — embed a wav of a voice the
model NEVER saw — trained via same-utterance ref crops, data.py:72-79):

  * TRAIN on 16 VoiceSpec speakers spanning f0_scale 0.55..2.10
    (geometric) with decorrelated timbre (dark<->bright harmonic mix),
    vibrato rate/depth.
  * EVALUATE on 6 voices never seen in training:
      - 4 INTERPOLATED: registers between training registers, timbre
        mixes not matching any training voice;
      - 2 EXTRAPOLATED: registers below/above the whole training range.
  * Identity is scored against ALL 22 candidate voices (16 train + 6
    held-out): a model that collapses unseen voices onto the nearest
    training voice scores 0 on held-out identity and shows
    nearest==some-train-voice in the per-result rows.

Reported per cohort (train / interp / extrap):
  mel identity accuracy + self/other L1 margin, pitch-transfer accuracy
  and relative error, and the embedding structure (intra-voice cosine,
  nearest-train-voice cosine/name for each held-out voice).

    python scripts/exp_cloning_heldout.py --work /tmp/zvx_heldout \
        --accelerator tpu --epochs 200 --all
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import yaml

SCRIPTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPTS)
sys.path.insert(0, REPO)
sys.path.insert(0, SCRIPTS)

from exp_cloning import (HOP, PHONES, PUNCTS, SR, _denorm_pitch,  # noqa: E402
                         gen_texts, modelcfg_dict, phase_train,
                         render_features)
from zerovox_tpu.utils.synthvoice import VoiceSpec  # noqa: E402

_LADDER = (220.0, 1.0)
_DARK = (np.array([0.60, 0.12, 0.04, 0.015]), -0.4)
_BRIGHT = (np.array([0.22, 0.30, 0.26, 0.16]), 0.45)


def make_voice(name: str, f0_scale: float, timbre: float,
               vib_rate: float, vib_depth: float) -> VoiceSpec:
    """Voice on the (register, timbre, vibrato) manifold; timbre in [0,1]
    mixes dark->bright harmonic profiles."""
    amps = (1 - timbre) * _DARK[0] + timbre * _BRIGHT[0]
    tilt = (1 - timbre) * _DARK[1] + timbre * _BRIGHT[1]
    return VoiceSpec(name, f0_scale=f0_scale, ladder=_LADDER,
                     harmonic_amps=tuple(float(a) for a in amps),
                     tilt=float(tilt), vibrato_rate=vib_rate,
                     vibrato_depth=vib_depth)


def voice_bank(extended: bool = False):
    """(train_voices, heldout_voices) dicts name->VoiceSpec.

    `extended` (round 5, VERDICT r4 task #3) adds 3 training voices OUTSIDE
    the original 0.55-2.10 register range so that the two "extrapolated"
    held-out voices (0.45, 2.50) fall INSIDE the training span
    (0.38..2.75): if corpus register coverage is really the lever the
    round-4 analysis named, the extrap cohort must flip to
    interpolated-level identity. Held-out voices and cohort labels are
    unchanged so the comparison against docs/convergence_cloning_r4b.json
    is direct."""
    n = 16
    scales = np.geomspace(0.55, 2.10, n)
    train = {}
    for i, s in enumerate(scales):
        # decorrelate timbre/vibrato from register with a stride-7 scramble
        t = ((i * 7) % n) / (n - 1)
        vr = 4.2 + 2.3 * (((i * 5) % n) / (n - 1))
        vd = 0.007 + 0.010 * (((i * 3) % n) / (n - 1))
        train[f"tr{i:02d}"] = make_voice(f"tr{i:02d}", float(s), t, vr, vd)
    if extended:
        train["tx00"] = make_voice("tx00", 0.38, 0.40, 4.8, 0.009)
        train["tx01"] = make_voice("tx01", 2.45, 0.65, 5.5, 0.012)
        train["tx02"] = make_voice("tx02", 2.75, 0.25, 4.4, 0.014)
    heldout = {
        # interpolated registers (between train scales), novel timbre mixes
        "ho_i0": make_voice("ho_i0", 0.72, 0.30, 5.1, 0.012),
        "ho_i1": make_voice("ho_i1", 1.05, 0.80, 4.6, 0.009),
        "ho_i2": make_voice("ho_i2", 1.55, 0.15, 6.0, 0.015),
        "ho_i3": make_voice("ho_i3", 1.90, 0.55, 5.4, 0.011),
        # extrapolated registers (outside the whole training range)
        "ho_x0": make_voice("ho_x0", 0.45, 0.50, 4.9, 0.010),
        "ho_x1": make_voice("ho_x1", 2.50, 0.50, 5.7, 0.013),
    }
    return train, heldout


N_TRAIN_TEXTS = 20
N_EVAL_TEXTS = 5  # texts 0,1 -> unseen reference wavs; 2..4 -> synthesis eval


def phase_gen(work: str, extended: bool = False):
    from zerovox_tpu.dsp.audio import save_wav
    from zerovox_tpu.symbols import Symbols
    from zerovox_tpu.text.tokenizer import transcript2phonemids

    symbols = Symbols(PHONES, PUNCTS)
    with open(os.path.join(work, "bank.json"), "w") as f:
        json.dump({"extended_registers": extended}, f)
    train_voices, heldout_voices = voice_bank(extended)
    pp = os.path.join(work, "pp", "cloning")
    for d in ["mel", "pitch", "energy", "duration"]:
        os.makedirs(os.path.join(pp, d), exist_ok=True)
    refs_dir = os.path.join(work, "refs")
    os.makedirs(refs_dir, exist_ok=True)

    train_texts = gen_texts(N_TRAIN_TEXTS, seed=21)
    eval_texts = gen_texts(N_EVAL_TEXTS, seed=77)

    lines = []
    pmin, pmax = np.inf, -np.inf
    emin, emax = np.inf, -np.inf
    for vi, (vname, voice) in enumerate(train_voices.items()):
        for ti, text in enumerate(train_texts):
            base = f"{vname}_{ti:03d}"
            ft = render_features(text, voice, seed=1000 * vi + ti)
            np.save(os.path.join(pp, "mel", f"mel-{base}.npy"), ft["mel"])
            np.save(os.path.join(pp, "pitch", f"pitch-{base}.npy"),
                    ft["phone_pitch"])
            np.save(os.path.join(pp, "energy", f"energy-{base}.npy"),
                    ft["phone_energy"])
            np.save(os.path.join(pp, "duration", f"duration-{base}.npy"),
                    ft["durations"])
            with open(os.path.join(pp, "mel", f"startstop-{base}.json"),
                      "w") as f:
                json.dump({"start_hop": 0,
                           "end_hop": int(ft["mel"].shape[0])}, f)
            pids, puncts = transcript2phonemids(text, symbols)
            assert len(pids) == len(ft["durations"])
            lines.append(f"{base}.wav|{','.join(map(str, pids))}|"
                         f"{','.join(map(str, puncts))}|{text}")
            pmin = min(pmin, ft["phone_pitch"].min())
            pmax = max(pmax, ft["phone_pitch"].max())
            emin = min(emin, ft["phone_energy"].min())
            emax = max(emax, ft["phone_energy"].max())

    # unseen reference wavs for EVERY candidate voice (train voices get
    # unseen wavs too — the round-3 style sanity cohort)
    for vi, (vname, voice) in enumerate(
            {**train_voices, **heldout_voices}.items()):
        for ei in (0, 1):
            from zerovox_tpu.utils.synthvoice import \
                render_text_with_boundaries
            wav, _ = render_text_with_boundaries(
                eval_texts[ei], SR, seed=9000 + 100 * vi + ei, voice=voice)
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
    print(f"corpus: {len(lines)} utterances ({len(train_voices)} train "
          f"voices x {len(train_texts)} texts), {len(heldout_voices)} "
          f"held-out voices, pitch range {pmin:.0f}-{pmax:.0f} Hz")


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
    from zerovox_tpu.training.data import (MEL_BUCKETS, PHONEME_BUCKETS,
                                           _bucket)

    extended = False
    bank_p = os.path.join(work, "bank.json")
    if os.path.exists(bank_p):
        with open(bank_p) as f:
            extended = bool(json.load(f).get("extended_registers", False))
    train_voices, heldout_voices = voice_bank(extended)
    all_voices = {**train_voices, **heldout_voices}

    with open(os.path.join(work, "model", "modelcfg.yaml")) as f:
        modelcfg = yaml.load(f, Loader=yaml.FullLoader)
    stats = modelcfg["stats"]
    cfg = ZeroVoxConfig.from_dict(modelcfg)
    symbols = Symbols(PHONES, PUNCTS)
    ckpt_dir = os.path.join(work, "model", "checkpoints")
    newest = sorted(f for f in os.listdir(ckpt_dir)
                    if f.endswith(".msgpack"))[-1]
    variables = load_native_checkpoint(os.path.join(ckpt_dir, newest))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    model = ZeroVox(cfg)
    with open(os.path.join(work, "texts.json")) as f:
        eval_texts = json.load(f)["eval"]

    def ref_mel_of(path):
        wav, _ = load_wav(path, target_sr=SR)
        amp = np.abs(wav)
        thr = amp.max() * 10 ** (-40 / 20)
        nz = np.flatnonzero(amp > thr)
        wav = wav[nz[0]: nz[-1] + 1]
        mel, _ = get_mel_from_wav(audio=wav, sampling_rate=SR, fft_size=1024,
                                  hop_size=HOP, win_length=1024, num_mels=80,
                                  fmin=0, fmax=8000)
        return mel.T[None].astype(np.float32)

    embs = {}
    for vname in all_voices:
        embs[vname] = [np.asarray(model.apply(
            variables,
            ref_mel_of(os.path.join(work, "refs", f"{vname}_ref{e}.wav")),
            train=False, method=ZeroVox.speaker_embed))[0, 0]
            for e in (0, 1)]

    def cos(a, b):
        return float(np.dot(a, b))  # L2-normalized embeddings

    # embedding structure: per held-out voice, nearest TRAIN voice + gap
    # between self-consistency (two refs of the same unseen voice) and the
    # nearest training neighbor
    emb_rows = {}
    for vname in heldout_voices:
        to_train = {t: cos(embs[vname][0], embs[t][0]) for t in train_voices}
        nearest = max(to_train, key=to_train.get)
        emb_rows[vname] = {
            "self_cos": cos(embs[vname][0], embs[vname][1]),
            "nearest_train": nearest,
            "nearest_train_cos": to_train[nearest],
            "nearest_train_f0_scale": train_voices[nearest].f0_scale,
            "own_f0_scale": heldout_voices[vname].f0_scale,
        }
    intra = [cos(embs[v][0], embs[v][1]) for v in all_voices]
    inter = [cos(embs[v][0], embs[w][0])
             for v in all_voices for w in all_voices if v != w]

    # synthesis conditioned on each voice's unseen ref0, teacher durations;
    # identity scored against ALL 22 candidate voices
    results = []
    for text_i, text in enumerate(eval_texts[2:], start=2):
        pids, puncts = transcript2phonemids(text, symbols)
        targets = {v: render_features(text, all_voices[v], seed=500 + text_i)
                   for v in all_voices}
        dur = next(iter(targets.values()))["durations"]
        n_frames = int(dur.sum())
        L = _bucket(len(pids), PHONEME_BUCKETS)
        T = _bucket(n_frames, MEL_BUCKETS)

        batch = {
            "phoneme": np.zeros((1, L), np.int32),
            "puncts": np.zeros((1, L), np.int32),
            "phoneme_mask": np.arange(L)[None] >= len(pids),
            "duration": np.zeros((1, L), np.int32),
        }
        batch["phoneme"][0, : len(pids)] = pids
        batch["puncts"][0, : len(pids)] = puncts
        batch["duration"][0, : len(pids)] = dur

        for vname in all_voices:
            spk = np.stack([embs[vname][0]])[:, None]
            enc = model.apply(variables, batch["phoneme"], batch["puncts"],
                              spk, batch["phoneme_mask"], batch["duration"],
                              method=ZeroVox.encode)
            mel, _, _ = model.apply(variables, enc["x"], batch["duration"],
                                    spk, T, method=ZeroVox.decode)
            mel = np.asarray(mel)[0, :n_frames]
            pred_pitch = np.asarray(enc["pitch"])[0, : len(pids)]

            l1 = {w: float(np.abs(mel - targets[w]["mel"][:n_frames]).mean())
                  for w in all_voices}
            hz = _denorm_pitch(pred_pitch, stats)
            err = {w: float(np.mean(np.abs(
                hz - targets[w]["phone_pitch"]) / targets[w]["phone_pitch"]))
                for w in all_voices}
            cohort = ("train" if vname in train_voices
                      else ("extrap" if vname.startswith("ho_x")
                            else "interp"))
            results.append({
                "text": text_i, "ref_voice": vname, "cohort": cohort,
                "nearest": min(l1, key=l1.get),
                "self_l1": l1[vname],
                "margin": float(np.mean([l1[w] for w in all_voices
                                         if w != vname])
                                / max(l1[vname], 1e-9)),
                "pitch_nearest": min(err, key=err.get),
                "pitch_relerr_self": err[vname],
            })

    def cohort_summary(name):
        rows = [r for r in results if r["cohort"] == name]
        return {
            "n": len(rows),
            "mel_identity_accuracy": float(np.mean(
                [r["nearest"] == r["ref_voice"] for r in rows])),
            "mel_margin_other_over_self": float(np.mean(
                [r["margin"] for r in rows])),
            "pitch_identity_accuracy": float(np.mean(
                [r["pitch_nearest"] == r["ref_voice"] for r in rows])),
            "pitch_relerr_self": float(np.mean(
                [r["pitch_relerr_self"] for r in rows])),
        }

    summary = {
        "checkpoint": newest,
        "extended_registers": extended,
        "n_candidate_voices": len(all_voices),
        "cohorts": {c: cohort_summary(c)
                    for c in ("train", "interp", "extrap")},
        "emb_cos_intra": float(np.mean(intra)),
        "emb_cos_inter": float(np.mean(inter)),
        "heldout_embedding_structure": emb_rows,
        "results": results,
    }
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/zvx_heldout")
    ap.add_argument("--accelerator", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--gen", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--extended-registers", action="store_true",
                    help="add 3 train voices outside 0.55-2.10 (register-"
                         "coverage lever test, round 5)")
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    if args.gen or args.all:
        phase_gen(args.work, extended=args.extended_registers)
    if args.train or args.all:
        phase_train(args.work, args.accelerator, args.epochs,
                    args.batch_size)
    if args.eval or args.all:
        summary = phase_eval(args.work, args.accelerator)
        print(json.dumps({k: v for k, v in summary.items()
                          if k != "results"}, indent=2))
        out = args.out_json or os.path.join(args.work, "heldout_eval.json")
        with open(out, "w") as f:
            json.dump(summary, f, indent=2)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
