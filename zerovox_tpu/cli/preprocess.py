"""Corpus preprocessing CLI.

Surface parity with the reference (utils/preprocess.py:659-766): takes a model
config + corpus yamls (files or directories), runs forced alignment then audio
feature extraction with a process pool, writes per-corpus stats.json, prints
leftover punctuation characters. Adds `--aligner` to select the alignment
acoustic model (HF wav2vec2-CTC checkpoint path, or 'pseudo' fallback).
"""

from __future__ import annotations

import argparse
import json
import multiprocessing
import os

import numpy as np
import yaml

from zerovox_tpu.preprocess.pipeline import (
    AudioPreprocessor,
    Preprocessor,
    gather_jobs_from_config,
)
from zerovox_tpu.training.data import preprocessed_data_path


def collect_corpus_configs(paths):
    configs = []
    for corpusfn in paths:
        if os.path.isdir(corpusfn):
            for cfn in sorted(os.listdir(corpusfn)):
                if os.path.splitext(cfn)[1] != ".yaml":
                    continue
                with open(os.path.join(corpusfn, cfn)) as f:
                    configs.append(yaml.load(f, Loader=yaml.FullLoader))
        else:
            with open(corpusfn) as f:
                configs.append(yaml.load(f, Loader=yaml.FullLoader))
    if not configs:
        raise Exception("*** error: no .yaml files found!")
    return configs


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("modelcfg", type=str, help="model config to preprocess for")
    parser.add_argument("corpora", type=str, nargs="+",
                        help="path[s] to corpus .yaml config file[s] or directorie[s]")
    parser.add_argument("-l", "--limit", type=int, default=1000,
                        help="limit number of audio files per config, default 1000 (0=unlimited)")
    parser.add_argument("-j", "--num-jobs", type=int, default=multiprocessing.cpu_count())
    parser.add_argument("-m", "--min-alignment-score", type=float, default=0.9)
    parser.add_argument("-b", "--batch-size", type=int, default=4)
    parser.add_argument("--aligner", type=str, default=None,
                        help="alignment model (required): HF wav2vec2-CTC checkpoint "
                             "path, 'tone' (bundled tone-speak CTC), or 'pseudo' "
                             "(explicitly accept NON-PHONETIC test alignments)")
    parser.add_argument("-v", "--verbose", action="store_true")
    parser.add_argument("--device", type=str, default=None,
                        choices=["cpu", "tpu"],
                        help="jax platform for the DSP/aligner compute "
                             "(default: jax's own choice; 'cpu' lets "
                             "preprocessing run while the TPU is busy or "
                             "unreachable)")
    args = parser.parse_args(argv)

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    elif args.device == "tpu":
        import jax

        # TPU plugins can register under another platform name (the axon
        # tunnel registers as 'axon' yet exposes TPU devices through the
        # default resolution); forcing jax_platforms='tpu' selects the
        # standard libtpu backend, which then fails. Let jax pick the
        # default backend and just verify it actually is a TPU.
        if jax.default_backend() != "tpu":
            raise SystemExit(
                "--device tpu: no TPU backend available "
                f"(default backend is {jax.default_backend()!r})")

    with open(args.modelcfg) as f:
        modelcfg = yaml.load(f, Loader=yaml.FullLoader)

    print(f"audio cfg:\n{modelcfg['audio']}")
    print(f"max txt len: {modelcfg['model']['max_txt_len']}, "
          f"max mel len: {modelcfg['model']['max_mel_len']}")

    corpus_configs = collect_corpus_configs(args.corpora)
    print(f"{len(corpus_configs)} corpora found.")

    lang = None
    for corpus in corpus_configs:
        if lang is None:
            lang = corpus["language"]
        elif lang != corpus["language"]:
            raise Exception("inconsistent languages detected")
    print(f"language is {lang}")

    from zerovox_tpu.preprocess.aligner import make_aligner

    limit = args.limit if args.limit > 0 else 10**9
    base_path = preprocessed_data_path()
    pproc = Preprocessor(modelcfg, lang=lang, min_avg_score=args.min_alignment_score,
                         aligner=make_aligner(args.aligner))
    aproc = AudioPreprocessor(modelcfg=modelcfg, verbose=args.verbose)

    for cfg in corpus_configs:
        jobs = gather_jobs_from_config(cfg, base_path, limit=limit)
        print(f"gathered {len(jobs)} jobs.")

        out_dir = os.path.join(base_path, cfg["path"]["preprocessed_path"])
        pproc.align(jobs, out_dir=out_dir, batch_size=args.batch_size)

        pitch_min = energy_min = np.finfo(np.float64).max
        pitch_max = energy_max = np.finfo(np.float64).min

        for job in jobs:
            stats = aproc.process(job)
            if not stats:
                continue
            pmin, pmax, emin, emax = stats
            pitch_min, pitch_max = min(pitch_min, pmin), max(pitch_max, pmax)
            energy_min, energy_max = min(energy_min, emin), max(energy_max, emax)

        with open(os.path.join(out_dir, "stats.json"), "w") as f:
            json.dump({"pitch": [float(pitch_min), float(pitch_max)],
                       "energy": [float(energy_min), float(energy_max)]}, f)

    print(f"extra puncts : {pproc.extra_puncts}")


if __name__ == "__main__":
    main()
