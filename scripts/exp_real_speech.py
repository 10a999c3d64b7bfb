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


def speed_perturb(wav: np.ndarray, factor: float) -> np.ndarray:
    """Resampling-based speed/pitch perturbation (the classic low-resource
    augmentation: play the recording at `factor` speed, shifting pitch by
    the same factor — sox `speed`). Linear interpolation is plenty at
    these factors."""
    n = int(len(wav) / factor)
    return np.interp(np.arange(n) * factor,
                     np.arange(len(wav)), wav).astype(np.float32)


def phase_build(work: str, augment: str = ""):
    """`augment`: comma-separated speed factors (e.g. "0.9,1.1") — each
    TRAIN segment additionally enters the corpus at those speeds,
    re-transcribed by the same unit inventory (the perturbed audio is a
    new observation, so it flows through the full self-labeling pipeline).
    Held-out speakers are never augmented. VERDICT r4 task #7: multiply
    training items >=3x and add register spread around each real voice."""
    from zerovox_tpu.dsp.audio import load_wav, save_wav
    from zerovox_tpu.preprocess import units

    factors = [float(f) for f in augment.split(",") if f] if augment else []

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

    # pass 2: transcripts + corpus/eval split (+ train-side augmentation)
    meta, eval_items = [], []
    for name in names:
        variants = [("", 1.0)]
        if name in train_spk:
            variants += [(f".sp{int(round(f * 100)):03d}", f)
                         for f in factors]
        for i, (w16, wsr) in enumerate(seg16[name]):
            for tag, f in variants:
                p16 = w16 if f == 1.0 else speed_perturb(w16, f)
                psr = wsr if f == 1.0 else speed_perturb(wsr, f)
                text = units.transcribe(p16, centroids)
                if len(text.replace(" ", "")) < 5:
                    continue
                base = f"{name}{tag}_{i:02d}"
                save_wav(os.path.join(corpus, "wavs", f"{base}.wav"),
                         psr, segsr[name])
                row = {"base": base, "speaker": name + tag, "text": text}
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


def wilson_ci(k: int, n: int, z: float = 1.96) -> tuple[float, float]:
    """95% Wilson score interval for a binomial proportion."""
    if n == 0:
        return 0.0, 1.0
    p = k / n
    d = 1 + z * z / n
    c = (p + z * z / (2 * n)) / d
    h = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / d
    return float(c - h), float(c + h)


def binom_p_ge(k: int, n: int, p: float) -> float:
    """Exact one-sided binomial P[X >= k | n, p]."""
    from math import comb

    return float(sum(comb(n, i) * p**i * (1 - p) ** (n - i)
                     for i in range(k, n + 1)))


def phase_eval(work: str, accelerator: str, vocoder: str | None = None) -> dict:
    """Widened zero-shot eval (VERDICT r4 task #1): every ordered
    (ref segment, target segment) pair of every held-out speaker is one
    eval item (>=20 items vs round 4's 7); identity is scored both against
    the held-out cohort and against ALL speakers (held-out + train
    enrollments — collapse onto a seen voice scores 0); the conditioning
    margin compares self-conditioning against EVERY other held-out voice,
    not one random pick. Binomial Wilson CIs + exact p-values throughout.
    `vocoder`: dir with a trained generator (config.json +
    generator.msgpack, zerovox-train-vocoder) — listening copies are then
    vocoded instead of Griffin-Lim."""
    import jax

    if accelerator == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from zerovox_tpu.config import ZeroVoxConfig
    from zerovox_tpu.dsp.griffinlim import GriffinLim
    from zerovox_tpu.dsp.audio import save_wav
    from zerovox_tpu.models.zerovox import ZeroVox
    from zerovox_tpu.training.checkpointing import load_native_checkpoint
    from zerovox_tpu.training.data import (MEL_BUCKETS, PHONEME_BUCKETS,
                                           _bucket)

    out_dir = _extract_eval_features(work)

    with open(os.path.join(work, "model", "modelcfg.yaml")) as f:
        modelcfg = yaml.load(f, Loader=yaml.FullLoader)
    cfg = ZeroVoxConfig.from_dict(modelcfg)
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
    pairable = {k: v for k, v in by_spk.items() if len(v) >= 2}
    print(f"held-out speakers: {sorted(by_spk)}; "
          f"cross-pairable (>=2 segments): {sorted(pairable)}")

    REF_LEN = 500  # the training ref-crop length (data.py MAX_REF_LEN):
    # fixed-length tiled crops keep speaker_embed ONE compiled program
    # across the ~170 embeddings this eval makes (variable-length mels
    # would compile per distinct length on this backend) and match the
    # crop distribution the encoder was trained on

    def embed(mel):
        t = mel.shape[0]
        if t >= REF_LEN:
            m = mel[:REF_LEN]
        else:
            m = np.tile(mel, (int(np.ceil(REF_LEN / t)), 1))[:REF_LEN]
        return np.asarray(model.apply(
            variables, m[None].astype(np.float32), train=False,
            method=ZeroVox.speaker_embed))[0, 0]

    # per-segment embeddings of every held-out speaker (1-segment speakers
    # still serve as identity distractors)
    seg_emb = {s: [embed(it["mel"]) for it in v] for s, v in by_spk.items()}

    # train-speaker enrollments from the TRAINING feature store (original,
    # non-augmented items only): the full-candidate identity check must
    # include every voice the model actually saw
    train_enroll = {}
    pp = os.path.join(work, "pp", "real")
    tt = os.path.join(pp, "train.txt")
    if os.path.exists(tt):
        per_spk: dict[str, list] = {}
        with open(tt) as f:
            for line in f:
                base = os.path.splitext(line.split("|")[0])[0]
                spk = base.rsplit("_", 1)[0]
                if ".sp" in spk:  # skip speed-perturbed pseudo-speakers
                    continue
                per_spk.setdefault(spk, []).append(base)
        for spk, bases in per_spk.items():
            embs = []
            for b in bases[:2]:
                mp = os.path.join(pp, "mel", f"mel-{b}.npy")
                if os.path.exists(mp):
                    embs.append(embed(np.load(mp)))
            if embs:
                e = np.mean(embs, axis=0)
                train_enroll[spk] = e / max(np.linalg.norm(e), 1e-9)

    def enroll(s: str, exclude_idx: int = -1) -> np.ndarray:
        """Held-out speaker enrollment: normalized mean over its segment
        embeddings, excluding the target segment (no target leakage)."""
        embs = [e for i, e in enumerate(seg_emb[s]) if i != exclude_idx]
        e = np.mean(embs, axis=0)
        return e / max(np.linalg.norm(e), 1e-9)

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

    spk_names = sorted(pairable)
    results = []
    listen_dir = os.path.join(work, "listen")
    os.makedirs(listen_dir, exist_ok=True)
    wrote_listen = 0

    if vocoder:
        from zerovox_tpu.models.hifigan import MelDec
        from zerovox_tpu.synthesize import ZeroVoxTTS

        md_cfg, md_vars = ZeroVoxTTS._load_meldec(vocoder)
        md = MelDec(md_cfg)

        def render(mel):
            # pad frames to a 64-multiple so the heavy generator compiles
            # once per bucket, not once per utterance length (tunneled
            # backends pay minutes per compile); trim to true samples
            t = mel.shape[0]
            tp = ((t + 63) // 64) * 64
            mp = np.pad(mel, ((0, tp - t), (0, 0)), mode="edge")
            wav = np.asarray(md.apply(
                md_vars, mp[None].astype(np.float32),
                normalize_before=True))[0]
            return wav[: t * md_cfg.total_upsample]
    else:
        gl = GriffinLim(n_iter=32)
        render = gl

    # wrong-speaker synths depend only on (target, wrong speaker): cache
    # across ref pairings
    wrong_cache: dict[tuple, np.ndarray] = {}

    for s in spk_names:
        segs = by_spk[s]
        for ti, it in enumerate(segs):
            gt = it["mel"]
            others = [w for w in spk_names if w != s]
            l1_wrong = {}
            for w in others:
                key = (it["base"], w)
                if key not in wrong_cache:
                    wrong_cache[key] = synth_mel(it, seg_emb[w][0])
                mw = wrong_cache[key]
                l1_wrong[w] = float(np.abs(mw - gt[: mw.shape[0]]).mean())

            for ri, ref in enumerate(segs):
                if ri == ti:
                    continue
                mel_self = synth_mel(it, seg_emb[s][ri])
                gtc = gt[: mel_self.shape[0]]
                l1_self = float(np.abs(mel_self - gtc).mean())

                # speaker-verification identity of the synthesized mel
                e_syn = embed(mel_self)
                cos_ho = {w: float(e_syn @ enroll(w, exclude_idx=ti
                                                  if w == s else -1))
                          for w in by_spk}
                nearest_ho = max(cos_ho, key=cos_ho.get)
                cos_full = dict(cos_ho)
                for w, e in train_enroll.items():
                    cos_full[f"train:{w}"] = float(e_syn @ e)
                nearest_full = max(cos_full, key=cos_full.get)

                wins = sum(l1_self < l1_wrong[w] for w in others)
                results.append({
                    "item": it["base"], "ref": ref["base"], "speaker": s,
                    "l1_self_cond": l1_self,
                    "l1_wrong_mean": float(np.mean(list(l1_wrong.values()))),
                    "margin_wins": wins, "margin_n": len(others),
                    "sv_nearest_heldout": nearest_ho,
                    "sv_nearest_full": nearest_full,
                    "sv_self_cos": cos_ho[s],
                    "sv_best_other_cos": max(v for w, v in cos_ho.items()
                                             if w != s),
                })
                if wrote_listen < 6 and ri == (1 if ti == 0 else 0):
                    save_wav(os.path.join(
                        listen_dir, f"{it['base']}_synth.wav"),
                        render(mel_self), SR)
                    save_wav(os.path.join(listen_dir, f"{it['base']}_gt.wav"),
                             render(gtc), SR)
                    wrote_listen += 1

    n = len(results)
    k_ho = sum(r["sv_nearest_heldout"] == r["speaker"] for r in results)
    k_full = sum(r["sv_nearest_full"] == r["speaker"] for r in results)
    k_allwin = sum(r["margin_wins"] == r["margin_n"] for r in results)
    wins_total = sum(r["margin_wins"] for r in results)
    cmp_total = sum(r["margin_n"] for r in results)
    n_cand_full = len(by_spk) + len(train_enroll)
    summary = {
        "checkpoint": newest,
        "n_eval_items": n,
        "n_heldout_speakers": len(by_spk),
        "n_pairable_speakers": len(spk_names),
        "n_candidates_full": n_cand_full,
        "sv_identity_heldout": {
            "accuracy": k_ho / n, "k": k_ho, "n": n,
            "chance": 1 / len(by_spk),
            "wilson95": wilson_ci(k_ho, n),
            "p_value_vs_chance": binom_p_ge(k_ho, n, 1 / len(by_spk))},
        "sv_identity_full": {
            "accuracy": k_full / n, "k": k_full, "n": n,
            "chance": 1 / n_cand_full,
            "wilson95": wilson_ci(k_full, n),
            "p_value_vs_chance": binom_p_ge(k_full, n, 1 / n_cand_full)},
        "cond_margin": {
            "pairwise_winrate": wins_total / max(cmp_total, 1),
            "wins": wins_total, "comparisons": cmp_total,
            "items_beating_all_wrong": k_allwin,
            "allwin_rate": k_allwin / n,
            "allwin_chance": 1 / (len(spk_names)),
            "allwin_p_value": binom_p_ge(k_allwin, n, 1 / len(spk_names)),
            "note": "items sharing a target segment are correlated; "
                    "p-values are upper bounds on independence"},
        "l1_self_cond_mean": float(np.mean(
            [r["l1_self_cond"] for r in results])),
        "l1_wrong_cond_mean": float(np.mean(
            [r["l1_wrong_mean"] for r in results])),
        "vocoder": vocoder or "griffinlim",
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
    ap.add_argument("--augment", default="",
                    help="comma-separated speed-perturbation factors for "
                         "the training split, e.g. '0.9,1.1' (3x corpus)")
    ap.add_argument("--vocoder", default=None,
                    help="trained vocoder dir (config.json + "
                         "generator.msgpack) for listening renders; "
                         "default Griffin-Lim")
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    if args.build or args.all:
        phase_build(args.work, augment=args.augment)
    if args.preprocess or args.all:
        phase_preprocess(args.work)
    if args.train or args.all:
        phase_train(args.work, args.accelerator, args.epochs, args.batch_size)
    if args.eval or args.all:
        summary = phase_eval(args.work, args.accelerator,
                             vocoder=args.vocoder)
        print(json.dumps({k: v for k, v in summary.items()
                          if k != "results"}, indent=2))
        out = args.out_json or os.path.join(args.work, "real_eval.json")
        with open(out, "w") as f:
            json.dump(summary, f, indent=2)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
