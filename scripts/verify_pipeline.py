"""End-to-end CLI pipeline verification / convergence run.

Fabricates a deterministic tone-speak corpus (zerovox_tpu/utils/synthvoice.py)
plus a small modelcfg and a torch HiFi-GAN meldec artifact, then drives the
real user flow through the actual CLIs, as subprocesses:

    zerovox-preprocess  ->  zerovox-train  ->  zerovox-demo

and reports a JSON summary (per-epoch losses, demo wav stats). With
--convergence it additionally loads the trained checkpoint and measures
teacher-duration mel reconstruction error against the training targets,
compared to an untrained model — the "training actually converges and the
checkpoint approximates targets" proof (reference capability:
utils/train_tts.py:298-310 + utils/export_hifigan.py force_duration path).

Usage:
    python scripts/verify_pipeline.py --accelerator tpu --epochs 12 \
        --work /tmp/zvx_verify --convergence
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

TEXTS = [
    "hello world",
    "the quick brown fox",
    "jumps over the lazy dog",
    "speech synthesis on tensor processing units",
    "a deterministic tone voice",
    "zero shot speaker cloning",
    "training must converge",
    "forced alignment ground truth",
]

MELDEC_CONF = {
    "resblock": "1",
    "upsample_rates": [8, 8, 2, 2],
    "upsample_kernel_sizes": [16, 16, 4, 4],
    "upsample_initial_channel": 32,
    "resblock_kernel_sizes": [3],
    "resblock_dilation_sizes": [[1, 3, 5]],
    "num_mels": 80,
    "sampling_rate": 22050,
}


def small_modelcfg():
    return {
        "audio": {"sampling_rate": 22050, "fft_size": 1024, "hop_size": 256,
                  "win_length": 1024, "num_mels": 80, "fmin": 0, "fmax": 8000},
        "model": {
            "max_txt_len": 64, "min_mel_len": 50, "max_mel_len": 1024,
            "phones": "'-abcdefghijklmnopqrstuvwxyz", "puncts": " ,.;:-!?\"",
            "emb_dim": 64, "punct_emb_dim": 16,
            "encoder": {"fs2_layer": 2, "fs2_head": 2, "vp_filter_size": 32,
                        "ve_n_bins": 32},
            "decoder": {"kind": "fastspeech2", "n_layers": 2, "n_head": 2,
                        "conv_filter_size": 128, "conv_kernel_size": [9, 1],
                        "dropout": 0.1, "scln": True},
            "resnet": {"layers": [1, 1, 1, 1], "num_filters": [8, 16, 16, 16],
                       "encoder_type": "ASP"},
        },
        "training": {"learning_rate": 3e-3},
    }


def fabricate(work: str):
    from zerovox_tpu.utils.synthvoice import make_corpus

    corpus_dir = os.path.join(work, "corpus")
    make_corpus(corpus_dir, TEXTS)

    mc_path = os.path.join(work, "modelcfg.yaml")
    cc_path = os.path.join(work, "corpus.yaml")
    with open(mc_path, "w") as f:
        yaml.dump(small_modelcfg(), f)
    with open(cc_path, "w") as f:
        yaml.dump({"dataset": "LJSpeech", "language": "en",
                   "path": {"corpus_path": corpus_dir,
                            "preprocessed_path": "tonespeak"}}, f)

    # torch meldec artifact in the reference on-disk layout
    meldec_dir = os.path.join(work, "meldec")
    os.makedirs(meldec_dir, exist_ok=True)
    import torch
    from reference_loader import load_reference

    _, _, _, hifigan_ref = load_reference()

    class AttrDict(dict):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.__dict__ = self

    torch.manual_seed(7)
    gen = hifigan_ref.Generator(AttrDict(dict(MELDEC_CONF)))
    with open(os.path.join(meldec_dir, "config.json"), "w") as f:
        json.dump(MELDEC_CONF, f)
    torch.save({"generator": gen.state_dict()},
               os.path.join(meldec_dir, "generator.ckpt"))
    return mc_path, cc_path, meldec_dir, corpus_dir


def run(cmd, env, log):
    print("+", " ".join(cmd), flush=True)
    with open(log, "w") as f:
        p = subprocess.run(cmd, env=env, stdout=f, stderr=subprocess.STDOUT,
                           cwd=REPO, text=True)
    out = open(log).read()
    sys.stdout.write(out[-4000:])
    if p.returncode != 0:
        raise RuntimeError(f"{cmd[0]} failed rc={p.returncode}, see {log}")
    return out


def teacher_recon_l1(modelcfg_path, ckpt, corpus_yaml, accelerator):
    """Masked mel L1 of teacher-duration forward vs training targets."""
    import jax

    if accelerator == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from zerovox_tpu.config import ZeroVoxConfig
    from zerovox_tpu.models.zerovox import ZeroVox
    from zerovox_tpu.symbols import Symbols
    from zerovox_tpu.training.checkpointing import load_native_checkpoint
    from zerovox_tpu.training.data import SpeechDataModule
    from zerovox_tpu.training.trainer import device_batch

    with open(modelcfg_path) as f:
        modelcfg = yaml.load(f, Loader=yaml.FullLoader)
    with open(corpus_yaml) as f:
        corpus = yaml.load(f, Loader=yaml.FullLoader)
    cfg = ZeroVoxConfig.from_dict(modelcfg)
    symbols = Symbols(modelcfg["model"]["phones"], modelcfg["model"]["puncts"])
    dm = SpeechDataModule(corpora=[corpus], symbols=symbols,
                          stats=modelcfg["stats"],
                          num_bins=modelcfg["model"]["encoder"]["ve_n_bins"],
                          batch_size=len(TEXTS), num_workers=0)
    dm.prepare_data()
    batch = device_batch(next(iter(dm.train_dataloader())))

    model = ZeroVox(cfg)

    def mel_l1(variables):
        outs, _ = model.apply(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
            batch, train=True, rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"])
        mask = ~batch["mel_mask"]
        diff = jnp.abs(outs["mel"] - batch["mel"]) * mask[..., None]
        return float(diff.sum() / (mask.sum() * outs["mel"].shape[-1]))

    trained = load_native_checkpoint(ckpt)
    rand = model.init({"params": jax.random.PRNGKey(9)}, batch, train=False)
    return mel_l1(trained), mel_l1(jax.device_get(rand))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/zvx_verify")
    ap.add_argument("--accelerator", default="tpu", choices=["tpu", "cpu"])
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--convergence", action="store_true")
    ap.add_argument("--train-args", default="",
                    help="extra whitespace-separated flags forwarded to "
                         "zerovox-train (e.g. '--packed-speaker --remat')")
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    mc_path, cc_path, meldec_dir, corpus_dir = fabricate(args.work)

    # set in os.environ (not just the subprocess env): the --convergence
    # teacher-reconstruction step builds the data module in-process
    os.environ["ZEROVOX_PREPROCESSED_DATA_PATH"] = os.path.join(args.work, "pp")
    env = dict(os.environ)
    os.makedirs(env["ZEROVOX_PREPROCESSED_DATA_PATH"], exist_ok=True)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    py = sys.executable
    run([py, "-m", "zerovox_tpu.cli.preprocess", mc_path, cc_path,
         "--aligner", "pseudo", "-m", "0.3", "-b", "2",
         "--device", args.accelerator],
        env, os.path.join(args.work, "preprocess.log"))

    model_out = os.path.join(args.work, "model1")
    train_log = os.path.join(args.work, "train.log")
    out = run([py, "-m", "zerovox_tpu.cli.train", "-c", mc_path, cc_path,
               "--out-folder", model_out, "--batch-size", str(args.batch_size),
               "--max-epochs", str(args.epochs), "--devices", "1",
               "--accelerator", args.accelerator, "--num_workers", "0"]
              + args.train_args.split(),
              env, train_log)

    losses = [(int(m.group(1)), float(m.group(2)), float(m.group(3)))
              for m in re.finditer(
                  r"epoch (\d+): loss=([\d.]+) mel=([\d.]+)", out)]
    assert losses, "no epoch losses parsed from train output"
    ckpts = sorted(os.listdir(os.path.join(model_out, "checkpoints")))
    ckpts = [c for c in ckpts if c.endswith(".msgpack")]
    assert ckpts, "no checkpoints written"
    assert os.path.exists(os.path.join(model_out, "modelcfg.yaml"))

    refwav = os.path.join(corpus_dir, "wavs", "tone000.wav")
    demo_wav = os.path.join(args.work, "demo_out.wav")
    run([py, "-m", "zerovox_tpu.cli.demo", "--model", model_out,
         "--meldec-model", meldec_dir, "--refaudio", refwav,
         "--infer-device", args.accelerator,
         "--wav-filename", demo_wav, "Hello world."],
        env, os.path.join(args.work, "demo.log"))

    from zerovox_tpu.dsp.audio import load_wav

    wav, sr = load_wav(demo_wav)
    summary = {
        "losses": losses,
        "loss_first": losses[0][1], "loss_last": losses[-1][1],
        "mel_first": losses[0][2], "mel_last": losses[-1][2],
        "demo_wav_seconds": len(wav) / sr,
        "demo_wav_rms": float(np.sqrt((wav ** 2).mean())),
        "n_checkpoints": len(ckpts),
    }

    if args.convergence:
        ckpt = os.path.join(model_out, "checkpoints", ckpts[-1])
        mc_trained = os.path.join(model_out, "modelcfg.yaml")
        trained_l1, random_l1 = teacher_recon_l1(
            mc_trained, ckpt, cc_path, args.accelerator)
        summary["teacher_mel_l1_trained"] = trained_l1
        summary["teacher_mel_l1_random"] = random_l1
        summary["converged"] = (losses[-1][2] < 0.5 * losses[0][2]
                                and trained_l1 < 0.5 * random_l1)

    summary["ok"] = (losses[-1][1] < losses[0][1]
                     and summary["demo_wav_seconds"] > 0.2)
    print(json.dumps(summary))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(summary, f, indent=1)
    if not summary["ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
