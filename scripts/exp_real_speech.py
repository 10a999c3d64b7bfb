"""First end-to-end run on REAL recorded human speech (VERDICT r3 task #4).

Every prior convergence/cloning run used synthetic corpora; real speech had
only unit-level contact (F0 sanity, aligner plumbing). This experiment runs
the FULL production pipeline — self-label -> preprocess (align + features)
-> train -> synthesize — over the reference's 68 bundled recorded speaker
wavs (read in place from /root/reference/zerovox/tts/refaudio/, one wav per
real human speaker, ~9.4 min total).

No pretrained ASR exists in this zero-egress environment, so transcripts
come from acoustic-unit discovery (preprocess/units.py): k-means units over
log-mel frames -> letter pseudo-transcripts, force-aligned by the REAL
pipeline via ClusterAligner (same centroids). The TTS task is then
unit-sequence -> speech — the model must learn real spectral detail, real
F0 contours, and real speaker identity from ref-mel crops.

Phases:
  --build       segment wavs at silences, fit units, write corpus +
                configs; hold out 8 speakers entirely (4 de / 4 en)
  --preprocess  run the real zerovox-preprocess CLI (cluster aligner);
                record the alignment-score distribution
  --train       run the real zerovox-train CLI
  --eval        zero-shot eval on REAL held-out voices:
                  * embed a never-seen wav segment of a never-trained
                    speaker, synthesize another segment's text with
                    teacher durations;
                  * speaker-verification identity: re-embed the
                    synthesized mel, nearest real-speaker embedding must
                    be the conditioning speaker;
                  * conditioning margin: mel L1 to ground truth with the
                    RIGHT embedding vs a WRONG speaker's embedding;
                  * Griffin-Lim renderings (no trained vocoder exists
                    here) of synthesized + ground-truth mels for
                    listening.

    python scripts/exp_real_speech.py --work /tmp/zvx_real --all \
        --accelerator tpu --epochs 300

Reference semantics matched: utils/preprocess.py:311-578 (pipeline),
zerovox/tts/synthesize.py:123-143 (zero-shot embedding from a wav).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

import numpy as np
import yaml

SCRIPTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPTS)
sys.path.insert(0, REPO)
sys.path.insert(0, SCRIPTS)

REFAUDIO = "/root/reference/zerovox/tts/refaudio"
SR = 22050
HOP = 256
PHONES = "'-abcdefghijklmnopqrstuvwxyz"
PUNCTS = " ,.;:-!?\""
N_HELDOUT = 8  # speakers never seen in training


def modelcfg_dict():
    # lane-friendly small config (hidden 112+16=128); real-speech corpus is
    # ~9 minutes, so capacity stays modest to overfit cleanly
    return {
        "audio": {"sampling_rate": SR, "fft_size": 1024, "hop_size": HOP,
                  "win_length": 1024, "num_mels": 80, "fmin": 0, "fmax": 8000},
        "model": {
            "max_txt_len": 256, "min_mel_len": 60, "max_mel_len": 1056,
            "phones": PHONES, "puncts": PUNCTS,
            "emb_dim": 112, "punct_emb_dim": 16,
            "encoder": {"fs2_layer": 3, "fs2_head": 2, "vp_filter_size": 64,
                        "ve_n_bins": 128},
            "decoder": {"kind": "fastspeech2", "n_layers": 4, "n_head": 2,
                        "conv_filter_size": 256, "conv_kernel_size": [9, 1],
                        "dropout": 0.1, "scln": True},
            "resnet": {"layers": [2, 2, 2, 2], "num_filters": [16, 32, 64, 128],
                       "encoder_type": "ASP"},
        },
        "training": {"learning_rate": 1e-3},
    }


def _speakers():
    wavs = sorted(glob.glob(os.path.join(REFAUDIO, "*.wav")))
    assert wavs, f"no reference wavs at {REFAUDIO}"
    return {os.path.splitext(os.path.basename(p))[0]: p for p in wavs}


def phase_build(work: str):
    from zerovox_tpu.dsp.audio import load_wav, save_wav
    from zerovox_tpu.preprocess import units

    spk = _speakers()
    names = sorted(spk)
    # held-out: interleave languages — last 4 'de_' and last 4 'en_' names
    de = [n for n in names if n.startswith("de_")]
    en = [n for n in names if n.startswith("en_")]
    heldout = sorted(de[-N_HELDOUT // 2:] + en[-N_HELDOUT // 2:])
    train_spk = [n for n in names if n not in heldout]

    corpus = os.path.join(work, "corpus")
    os.makedirs(os.path.join(corpus, "wavs"), exist_ok=True)

    # pass 1: load + segment everything at 16 kHz (the unit frame rate)
    seg16, segsr = {}, {}
    feats = []
    for name, path in spk.items():
        wav16, _ = load_wav(path, target_sr=units.UNIT_SAMPLE_RATE)
        wav_sr, sr = load_wav(path)
        spans = units.segment_wav(wav16, units.UNIT_SAMPLE_RATE)
        segs = []
        for i, (s, e) in enumerate(spans):
            w16 = wav16[s:e]
            s_sr = int(s * sr / units.UNIT_SAMPLE_RATE)
            e_sr = int(e * sr / units.UNIT_SAMPLE_RATE)
            segs.append((w16, wav_sr[s_sr:e_sr]))
            feats.append(units.unit_features(w16)[0])
        seg16[name] = segs
        segsr[name] = sr

    centroids = units.fit_units(feats, k=26, seed=0, iters=25)
    units.save_units(os.path.join(work, "units.npz"), centroids)

    # pass 2: transcripts + corpus/eval split
    meta, eval_items = [], []
    for name in names:
        for i, (w16, wsr) in enumerate(seg16[name]):
            text = units.transcribe(w16, centroids)
            if len(text.replace(" ", "")) < 5:
                continue
            base = f"{name}_{i:02d}"
            save_wav(os.path.join(corpus, "wavs", f"{base}.wav"),
                     wsr, segsr[name])
            row = {"base": base, "speaker": name, "text": text}
            if name in heldout:
                eval_items.append(row)
            else:
                meta.append(row)

    with open(os.path.join(corpus, "metadata.csv"), "w") as f:
        for r in meta:
            f.write(f"{r['base']}|{r['text']}\n")

    with open(os.path.join(work, "modelcfg.yaml"), "w") as f:
        yaml.dump(modelcfg_dict(), f)
    with open(os.path.join(work, "corpus.yaml"), "w") as f:
        yaml.dump({"dataset": "LJSpeech-real", "language": "en",
                   "path": {"corpus_path": corpus,
                            "preprocessed_path": "real"}}, f)
    with open(os.path.join(work, "split.json"), "w") as f:
        json.dump({"train_speakers": train_spk, "heldout": heldout,
                   "train_items": meta, "eval_items": eval_items}, f, indent=1)
    print(f"corpus: {len(meta)} train utterances over {len(train_spk)} real "
          f"speakers; {len(eval_items)} eval utterances over {len(heldout)} "
          f"held-out speakers")


def phase_preprocess(work: str):
    env = dict(os.environ)
    env["ZEROVOX_PREPROCESSED_DATA_PATH"] = os.path.join(work, "pp")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "-m", "zerovox_tpu.cli.preprocess",
           os.path.join(work, "modelcfg.yaml"),
           os.path.join(work, "corpus.yaml"),
           "--aligner", f"cluster:{os.path.join(work, 'units.npz')}",
           "-m", "0.5", "-j", "1", "--device", "cpu", "-l", "0"]
    print("+", " ".join(cmd), flush=True)
    log = os.path.join(work, "preprocess.log")
    with open(log, "w") as f:
        p = subprocess.run(cmd, env=env, stdout=f, stderr=subprocess.STDOUT,
                           cwd=REPO, text=True)
    sys.stdout.write(open(log).read()[-2000:])
    if p.returncode != 0:
        raise RuntimeError(f"preprocess failed rc={p.returncode}, see {log}")

    # alignment-score distribution over the whole corpus (same aligner +
    # Viterbi the pipeline used)
    from zerovox_tpu.dsp.audio import load_wav
    from zerovox_tpu.preprocess.aligner import make_aligner
    from zerovox_tpu.preprocess.ctc_align import forced_align

    al = make_aligner(f"cluster:{os.path.join(work, 'units.npz')}")
    with open(os.path.join(work, "split.json")) as f:
        split = json.load(f)
    scores = []
    for r in split["train_items"] + split["eval_items"]:
        wav, _ = load_wav(os.path.join(work, "corpus", "wavs",
                                       f"{r['base']}.wav"),
                          target_sr=al.sample_rate)
        wav = wav[: (len(wav) // al.hop_size) * al.hop_size]
        em = al.emissions(wav[None])[0]
        tg = np.asarray([al.dictionary[c]
                         for c in r["text"].replace(" ", "")], np.int64)
        try:
            _, sc = forced_align(em, tg, blank=al.blank)
            scores.append(float(np.mean(np.exp(sc))))
        except Exception:
            scores.append(0.0)
    scores = np.asarray(scores)
    dist = {"n": int(scores.size), "mean": float(scores.mean()),
            "p10": float(np.percentile(scores, 10)),
            "p50": float(np.percentile(scores, 50)),
            "p90": float(np.percentile(scores, 90)),
            "below_0.5": int((scores < 0.5).sum())}
    with open(os.path.join(work, "align_scores.json"), "w") as f:
        json.dump(dist, f, indent=1)
    print("alignment scores:", json.dumps(dist))

    n_kept = sum(1 for _ in open(
        os.path.join(work, "pp", "real", "train.txt")))
    print(f"preprocessed items kept: {n_kept}")


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
           "--checkpoint-every-n-epochs", str(max(1, epochs // 10))]
    print("+", " ".join(cmd), flush=True)
    log = os.path.join(work, "train.log")
    with open(log, "w") as f:
        p = subprocess.run(cmd, env=env, stdout=f, stderr=subprocess.STDOUT,
                           cwd=REPO, text=True)
    tail = open(log).read()
    sys.stdout.write(tail[-2500:])
    if p.returncode != 0:
        raise RuntimeError(f"training failed rc={p.returncode}, see {log}")

    # loss curve from the epoch log lines
    losses = [(int(m.group(1)), float(m.group(2))) for m in re.finditer(
        r"epoch (\d+): loss=([0-9.]+)", tail)]
    curve = {str(e): l for e, l in losses
             if e % max(1, len(losses) // 20) == 0 or e == losses[-1][0]}
    with open(os.path.join(work, "loss_curve.json"), "w") as f:
        json.dump({"epochs": losses[-1][0] if losses else None,
                   "first": losses[0][1] if losses else None,
                   "last": losses[-1][1] if losses else None,
                   "curve": curve}, f, indent=1)
    if losses:
        print(f"loss: {losses[0][1]:.4f} (epoch {losses[0][0]}) -> "
              f"{losses[-1][1]:.4f} (epoch {losses[-1][0]})")


def _extract_eval_features(work: str):
    """Run the REAL pipeline classes over the held-out items into pp_eval."""
    from zerovox_tpu.preprocess.aligner import make_aligner
    from zerovox_tpu.preprocess.pipeline import AudioPreprocessor, Preprocessor

    with open(os.path.join(work, "split.json")) as f:
        split = json.load(f)
    with open(os.path.join(work, "modelcfg.yaml")) as f:
        modelcfg = yaml.load(f, Loader=yaml.FullLoader)

    out_dir = os.path.join(work, "pp_eval")
    for d in ["wavs", "mel", "pitch", "energy", "duration"]:
        os.makedirs(os.path.join(out_dir, d), exist_ok=True)
    tt = os.path.join(out_dir, "train.txt")
    if os.path.exists(tt):
        os.remove(tt)

    al = make_aligner(f"cluster:{os.path.join(work, 'units.npz')}")
    pre = Preprocessor(modelcfg, "en", min_avg_score=0.5, aligner=al)
    ap = AudioPreprocessor(modelcfg)
    jobs = [{"transcript": r["text"],
             "wav_path": os.path.join(work, "corpus", "wavs",
                                      f"{r['base']}.wav"),
             "dest_wav": f"{r['base']}.wav", "out_dir": out_dir,
             "base_name": r["base"]} for r in split["eval_items"]]
    jobs = pre.align(jobs, out_dir, batch_size=2)
    kept = 0
    for job in jobs:
        if "durations" in job and ap.process(job) is not None:
            kept += 1
    print(f"eval features: {kept}/{len(split['eval_items'])} held-out "
          f"utterances extracted")
    return out_dir


def phase_eval(work: str, accelerator: str) -> dict:
    import jax

    if accelerator == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from zerovox_tpu.config import ZeroVoxConfig
    from zerovox_tpu.dsp.griffinlim import GriffinLim
    from zerovox_tpu.dsp.audio import save_wav
    from zerovox_tpu.models.zerovox import ZeroVox
    from zerovox_tpu.symbols import Symbols
    from zerovox_tpu.training.checkpointing import load_native_checkpoint
    from zerovox_tpu.training.data import (MEL_BUCKETS, PHONEME_BUCKETS,
                                           _bucket)

    out_dir = _extract_eval_features(work)

    with open(os.path.join(work, "model", "modelcfg.yaml")) as f:
        modelcfg = yaml.load(f, Loader=yaml.FullLoader)
    cfg = ZeroVoxConfig.from_dict(modelcfg)
    symbols = Symbols(PHONES, PUNCTS)
    ckpt_dir = os.path.join(work, "model", "checkpoints")
    newest = sorted(f for f in os.listdir(ckpt_dir)
                    if f.endswith(".msgpack"))[-1]
    variables = load_native_checkpoint(os.path.join(ckpt_dir, newest))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    model = ZeroVox(cfg)

    # eval items with extracted features, grouped per speaker
    items = []
    with open(os.path.join(out_dir, "train.txt")) as f:
        for line in f:
            wavname, phones, puncts, text = line.strip().split("|")
            base = os.path.splitext(wavname)[0]
            mel_p = os.path.join(out_dir, "mel", f"mel-{base}.npy")
            dur_p = os.path.join(out_dir, "duration", f"duration-{base}.npy")
            if os.path.exists(mel_p) and os.path.exists(dur_p):
                items.append({
                    "base": base,
                    "speaker": base.rsplit("_", 1)[0],
                    "phones": [int(x) for x in phones.split(",")],
                    "puncts": [int(x) for x in puncts.split(",")],
                    "mel": np.load(mel_p),          # [T, n_mels]
                    "dur": np.load(dur_p).astype(np.int32),
                })
    by_spk: dict[str, list] = {}
    for it in items:
        by_spk.setdefault(it["speaker"], []).append(it)
    # need >= 2 segments per speaker: one for the embedding, others for eval
    by_spk = {k: v for k, v in by_spk.items() if len(v) >= 2}
    print(f"eval speakers with >=2 segments: {sorted(by_spk)}")

    def embed(mel):
        return np.asarray(model.apply(
            variables, mel[None].astype(np.float32), train=False,
            method=ZeroVox.speaker_embed))[0, 0]

    # reference embeddings: segment 0 of each held-out speaker (never
    # trained, never used as a synthesis target below)
    ref_emb = {s: embed(v[0]["mel"]) for s, v in by_spk.items()}

    def synth_mel(it, spk_vec):
        L = _bucket(len(it["phones"]), PHONEME_BUCKETS)
        n_frames = int(it["dur"].sum())
        T = _bucket(n_frames, MEL_BUCKETS)
        batch = {
            "phoneme": np.zeros((1, L), np.int32),
            "puncts": np.zeros((1, L), np.int32),
            "phoneme_mask": np.arange(L)[None] >= len(it["phones"]),
            "duration": np.zeros((1, L), np.int32),
        }
        batch["phoneme"][0, : len(it["phones"])] = it["phones"]
        batch["puncts"][0, : len(it["puncts"])] = it["puncts"]
        batch["duration"][0, : len(it["dur"])] = it["dur"]
        spk = spk_vec[None, None].astype(np.float32)
        enc = model.apply(variables, batch["phoneme"], batch["puncts"], spk,
                          batch["phoneme_mask"], batch["duration"],
                          method=ZeroVox.encode)
        mel, _, _ = model.apply(variables, enc["x"], batch["duration"], spk,
                                T, method=ZeroVox.decode)
        return np.asarray(mel)[0, :n_frames]

    spk_names = sorted(by_spk)
    rng = np.random.default_rng(0)
    results = []
    gl = GriffinLim(n_iter=32)
    listen_dir = os.path.join(work, "listen")
    os.makedirs(listen_dir, exist_ok=True)
    wrote_listen = 0

    for s in spk_names:
        for it in by_spk[s][1:]:
            mel_self = synth_mel(it, ref_emb[s])
            gt = it["mel"][: mel_self.shape[0]]
            l1_self = float(np.abs(mel_self - gt).mean())

            # conditioning margin vs a wrong speaker's embedding
            other = spk_names[(spk_names.index(s) + 1 + int(rng.integers(
                0, len(spk_names) - 1))) % len(spk_names)]
            if other == s:
                other = spk_names[(spk_names.index(s) + 1) % len(spk_names)]
            mel_other = synth_mel(it, ref_emb[other])
            l1_other = float(np.abs(mel_other - gt).mean())

            # speaker-verification identity of the synthesized mel
            e_syn = embed(mel_self)
            cosines = {w: float(e_syn @ ref_emb[w]) for w in spk_names}
            nearest = max(cosines, key=cosines.get)

            results.append({
                "item": it["base"], "speaker": s,
                "l1_self_cond": l1_self, "l1_wrong_cond": l1_other,
                "wrong_speaker": other,
                "sv_nearest": nearest, "sv_self_cos": cosines[s],
                "sv_best_other_cos": max(v for w, v in cosines.items()
                                         if w != s),
            })
            if wrote_listen < 6:
                save_wav(os.path.join(listen_dir, f"{it['base']}_synth.wav"),
                         gl(mel_self), SR)
                save_wav(os.path.join(listen_dir, f"{it['base']}_gt.wav"),
                         gl(gt), SR)
                wrote_listen += 1

    summary = {
        "checkpoint": newest,
        "n_eval_items": len(results),
        "n_heldout_speakers": len(spk_names),
        "sv_identity_accuracy": float(np.mean(
            [r["sv_nearest"] == r["speaker"] for r in results])),
        "cond_margin_winrate": float(np.mean(
            [r["l1_self_cond"] < r["l1_wrong_cond"] for r in results])),
        "l1_self_cond_mean": float(np.mean(
            [r["l1_self_cond"] for r in results])),
        "l1_wrong_cond_mean": float(np.mean(
            [r["l1_wrong_cond"] for r in results])),
        "results": results,
    }
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/zvx_real")
    ap.add_argument("--accelerator", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--preprocess", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    if args.build or args.all:
        phase_build(args.work)
    if args.preprocess or args.all:
        phase_preprocess(args.work)
    if args.train or args.all:
        phase_train(args.work, args.accelerator, args.epochs, args.batch_size)
    if args.eval or args.all:
        summary = phase_eval(args.work, args.accelerator)
        print(json.dumps({k: v for k, v in summary.items()
                          if k != "results"}, indent=2))
        out = args.out_json or os.path.join(args.work, "real_eval.json")
        with open(out, "w") as f:
            json.dump(summary, f, indent=2)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
