"""HiFi-GAN vocoder training CLI.

New capability over the reference, which exports a vocoder-adaptation
corpus (utils/export_hifigan.py:37-171) and delegates the actual GAN
training to an external ParallelWaveGAN repo. Here the loop runs in-repo,
TPU-native (zerovox_tpu/training/vocoder.py), consuming either preprocess
output dirs (train.txt + wavs/ + mel/) or the `.h5` export dirs
`zerovox-export-hifigan --orig` writes.

    zerovox-train-vocoder --data /tmp/zvx_real/pp/real \\
        --out-folder /tmp/voc1 --max-epochs 200 --batch-size 16

The trained artifact (`config.json` + `generator.msgpack`) drops into every
inference surface: `zerovox-demo --meldec-model /tmp/voc1`, serving,
streaming. `--bench` measures one forced-marginal step-time/roofline row
instead of training (utils/profiling.py semantics — block_until_ready is
not an execution fence on tunneled backends).
"""

from __future__ import annotations

import argparse
import json
import os


def get_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, nargs="+", required=True,
                   help="preprocess output dir(s) and/or h5 export dir(s)")
    p.add_argument("--out-folder", type=str, default="myvocoder1")
    p.add_argument("--accelerator", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--max-epochs", type=int, default=200)
    p.add_argument("--segment-frames", type=int, default=32,
                   help="mel frames per training segment (32*hop=8192 "
                        "samples, the upstream HiFi-GAN default)")
    p.add_argument("--learning-rate", type=float, default=2e-4)
    p.add_argument("--precision", default="32",
                   help="'32' (default: GAN training is noise-sensitive) "
                        "or 'bf16-mixed'")
    p.add_argument("--generator-config", type=str, default=None,
                   help="HiFi-GAN config.json (default: V1 80-mel 22k)")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="resume full GAN state from a vocoder-*.msgpack")
    p.add_argument("--checkpoint-every-n-epochs", type=int, default=25)
    p.add_argument("--log-every-n-epochs", type=int, default=1)
    p.add_argument("--mel-weight", type=float, default=45.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--gan-step", default="fused", choices=["fused", "split"],
                   help="'fused' = one XLA program per GAN round; 'split' = "
                        "separate D-update and G-update programs (same math "
                        "and update order). Use split when the backend's "
                        "compiler rejects the fused graph — the tunneled "
                        "v5e remote compile dies on it at B=16 "
                        "(docs/PERFORMANCE.md round 5)")
    p.add_argument("--data-device-cache", default="on", choices=["on", "off"],
                   help="keep the (mel, wav) corpus resident in HBM and cut "
                        "training segments on device (bit-identical batches; "
                        "removes the per-step host transfer — "
                        "docs/PERFORMANCE.md round 5). Falls back to host "
                        "loading over the HBM budget or multi-process")
    p.add_argument("--bench", action="store_true",
                   help="measure step time + FLOPs/MFU, print one JSON row, "
                        "and exit without training")
    p.add_argument("--bench-steps", type=int, default=20)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)

    from zerovox_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax

    if args.accelerator == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from zerovox_tpu.models.hifigan import HifiGanConfig
    from zerovox_tpu.training.vocoder import (VocoderDataConfig,
                                              VocoderDataset, VocoderTrainer,
                                              VocoderTrainerConfig)

    if args.generator_config:
        with open(args.generator_config) as f:
            gcfg = HifiGanConfig.from_dict(json.load(f))
    else:
        gcfg = HifiGanConfig()
    dcfg = VocoderDataConfig(num_mels=gcfg.num_mels,
                             sampling_rate=gcfg.sampling_rate,
                             segment_frames=args.segment_frames)
    assert gcfg.total_upsample == dcfg.hop_size, (
        f"generator upsample {gcfg.total_upsample} != hop {dcfg.hop_size}")

    dataset = VocoderDataset(args.data, dcfg, seed=args.seed)
    steps_per_epoch = max(1, (len(dataset) + args.batch_size - 1)
                          // args.batch_size)
    print(f"vocoder corpus: {len(dataset)} items, "
          f"{steps_per_epoch} steps/epoch at B={args.batch_size}")

    tcfg = VocoderTrainerConfig(
        max_epochs=args.max_epochs, batch_size=args.batch_size,
        learning_rate=args.learning_rate, out_folder=args.out_folder,
        precision=args.precision, mel_weight=args.mel_weight,
        checkpoint_every_n_epochs=args.checkpoint_every_n_epochs,
        log_every_n_epochs=args.log_every_n_epochs, seed=args.seed,
        device_cache=args.data_device_cache == "on",
        split_step=args.gan_step == "split")
    trainer = VocoderTrainer(gcfg, dcfg, tcfg, steps_per_epoch)
    state = trainer.init_state()
    if args.checkpoint:
        state = trainer.restore_state(state, args.checkpoint)
        print(f"resumed GAN state from {args.checkpoint} "
              f"(step {int(jax.device_get(state.step))})")

    if args.bench:
        bench_step(args, trainer, dataset, state)
        return

    state = trainer.fit(dataset, state)
    gen_path = trainer.save_generator(state, args.out_folder)
    print(f"wrote {gen_path} (+ config.json): ready for "
          f"--meldec-model {args.out_folder}")


def bench_step(args, trainer, dataset, state):
    """Forced-marginal step timing + XLA cost-analysis FLOPs (the
    bench_train_scaling.py protocol: chain N donated steps, fence with a
    device_get, report the marginal cost between two chain lengths)."""
    import time

    import jax

    from zerovox_tpu.parallel.mesh import shard_batch

    batch = shard_batch(next(dataset.batches(args.batch_size)), trainer.mesh)

    def _flops(compiled):
        try:
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            return float(ca.get("flops", 0.0)) or None
        except Exception:
            return None

    t0 = time.perf_counter()
    parts = getattr(trainer._step, "parts", None)
    if parts:  # split lowering: compile + cost both halves
        compiled = [p.lower(state, batch).compile() for p in parts]
        flops = sum(filter(None, (_flops(c) for c in compiled))) or None
    else:
        flops = _flops(trainer._step.lower(state, batch).compile())
    compile_s = time.perf_counter() - t0

    def run(n):
        nonlocal state
        losses = None
        for _ in range(2):
            state, losses = trainer._step(state, batch)
        jax.device_get(losses["g_total"])
        t0 = time.perf_counter()
        for _ in range(n):
            state, losses = trainer._step(state, batch)
        jax.device_get(losses["g_total"])
        return time.perf_counter() - t0

    n1, n2 = max(args.bench_steps // 4, 1), args.bench_steps
    t1, t2 = run(n1), run(n2)
    step_s = (t2 - t1) / (n2 - n1)
    peak = 197e12 if args.precision != "32" else 49e12  # v5e per chip
    row = {"batch": args.batch_size, "segment_frames": args.segment_frames,
           "precision": args.precision,
           "ms_per_step": round(1000 * step_s, 2),
           "flops_per_step": flops,
           "mfu_pct": round(100 * flops / step_s / peak, 2) if flops else None,
           "compile_s": round(compile_s, 1)}
    print(json.dumps(row))


if __name__ == "__main__":
    main()
