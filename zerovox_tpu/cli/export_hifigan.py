"""Vocoder-adaptation corpus exporter.

Surface parity with reference utils/export_hifigan.py: runs the trained TTS
over the training corpus with teacher durations (`force_duration`) so the
synthesized mel is frame-aligned with the ground-truth audio, and writes
paired (ground-truth wav | synthesized wav | mel .h5 feats | text) into
train/dev splits (1/100 to dev) for external HiFiGAN/ParallelWaveGAN
fine-tuning. `--orig` exports ground-truth mels instead (export_orig path).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np
import yaml

from zerovox_tpu.hub import DEFAULT_MELDEC_MODEL_NAME, get_default_model
from zerovox_tpu.symbols import Symbols

DEBUG_LIMIT = 0


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("corpora", type=str, nargs="+", help="corpus yaml(s) or dir(s)")
    parser.add_argument("--out-dir", type=str, required=True)
    parser.add_argument("--model", type=str, default=None,
                        help="TTS model dir (default: language default model)")
    parser.add_argument("--meldec-model", default=DEFAULT_MELDEC_MODEL_NAME, type=str)
    parser.add_argument("--orig", action="store_true",
                        help="export ground-truth mels instead of synthesized")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args(argv)

    from zerovox_tpu.cli.preprocess import collect_corpus_configs
    from zerovox_tpu.training.data import SpeechDataModule

    corpora = collect_corpus_configs(args.corpora)

    lang = None
    for corpus in corpora:
        if lang is None:
            lang = corpus["language"]
        elif lang != corpus["language"]:
            raise Exception(f"multiple languages detected: {lang} != {corpus['language']}")

    model_dir = args.model or get_default_model(lang=str(lang))
    with open(os.path.join(model_dir, "modelcfg.yaml")) as f:
        modelcfg = yaml.load(f, Loader=yaml.FullLoader)

    from zerovox_tpu.synthesize import ZeroVoxTTS

    _, synth = ZeroVoxTTS.load_model(model_dir, meldec_model=args.meldec_model,
                                     verbose=args.verbose)

    symbols = Symbols(modelcfg["model"]["phones"], modelcfg["model"]["puncts"])
    os.makedirs(os.path.join(args.out_dir, "train"), mode=0o755, exist_ok=True)
    os.makedirs(os.path.join(args.out_dir, "dev"), mode=0o755, exist_ok=True)

    datamodule = SpeechDataModule(
        corpora=corpora, symbols=symbols, stats=modelcfg["stats"],
        num_bins=modelcfg["model"]["encoder"]["ve_n_bins"],
        batch_size=args.batch_size, num_workers=args.num_workers,
        drop_last=False,  # export every sample; tail batch is wrap-padded
    )
    datamodule.prepare_data()

    sr = modelcfg["audio"]["sampling_rate"]
    hop_length = modelcfg["audio"]["hop_size"]

    from zerovox_tpu.models.zerovox import ZeroVox

    model = synth._model
    meldec = synth._meldec

    @jax.jit
    def teacher_forward(variables, batch):
        return model.apply(variables, batch, train=False, force_duration=True)

    @jax.jit
    def vocode(md_variables, mel):
        return meldec.apply(md_variables, mel, normalize_before=True)

    import h5py
    from zerovox_tpu.dsp.audio import load_wav, save_wav
    from zerovox_tpu.training.trainer import device_batch

    cnt = 0
    debug_cnt = 0
    for x, y in datamodule.train_dataloader():
        batch = device_batch((x, y))
        pred = teacher_forward(synth._variables, batch)
        mels = pred["mel"]  # [B, T, n_mels], synthesized (teacher-aligned)
        if args.orig:
            mels = batch["mel"]
        wavs = np.asarray(vocode(synth._meldec_variables, mels))

        for i in range(wavs.shape[0] - x.get("pad_items", 0)):
            cnt += 1
            split = "dev" if cnt % 100 == 0 else "train"
            out_dir = os.path.join(args.out_dir, split,
                                   os.path.basename(x["preprocessed_paths"][i]))
            os.makedirs(out_dir, mode=0o755, exist_ok=True)

            wav_len = int(x["mel_len"][i])
            dur_sum = int(np.sum(x["duration"][i]))
            assert wav_len == dur_sum

            orig_wav_path = os.path.join(x["preprocessed_paths"][i], "wavs",
                                         x["basenames"][i] + ".wav")
            orig_wav, _ = load_wav(orig_wav_path)
            orig_wav = orig_wav[x["starts"][i] * hop_length : (x["ends"][i] + 1) * hop_length]

            padding_needed = wav_len * hop_length - len(orig_wav)
            if padding_needed > 0:
                print(f"warning: padding of {padding_needed} samples needed for {orig_wav_path}")
                orig_wav = np.pad(orig_wav, (0, padding_needed))
            orig_wav = orig_wav[: wav_len * hop_length]

            save_wav(os.path.join(out_dir, f"{x['basenames'][i]}.wav"), orig_wav, sr)
            save_wav(os.path.join(out_dir, f"{x['basenames'][i]}-synth.wav"),
                     wavs[i][: wav_len * hop_length], sr)

            mel = np.asarray(mels[i])[:wav_len]  # [T, n_mels]
            with h5py.File(os.path.join(out_dir, f"{x['basenames'][i]}.h5"), "w") as hdf:
                hdf.create_dataset("feats", data=mel)
                hdf.create_dataset("wave", data=orig_wav.astype(np.float32))

            with open(os.path.join(out_dir, f"{x['basenames'][i]}.txt"), "w") as f:
                f.write(x["text"][i])

        debug_cnt += 1
        if DEBUG_LIMIT and debug_cnt >= DEBUG_LIMIT:
            print(f"*** debug limit ({DEBUG_LIMIT} batches) reached ***")
            break

    print(f"exported {cnt} items to {args.out_dir}")


if __name__ == "__main__":
    main()
