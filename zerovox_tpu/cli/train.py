"""Training CLI.

Surface parity with the reference trainer (utils/train_tts.py:41-310):
collects corpus yamls (files or directories), merges per-corpus stats.json
into global pitch/energy ranges, writes the merged `modelcfg.yaml` artifact
(the inference contract), builds the data module + model, supports manual
checkpoint restore for incremental training and `--train-decoder-only`
freeze/reinit — then runs the TPU-native SPMD training loop
(zerovox_tpu/training/trainer.py) instead of Lightning.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import yaml

from zerovox_tpu.config import ZeroVoxConfig
from zerovox_tpu.hub import DEFAULT_MELDEC_MODEL_NAME
from zerovox_tpu.symbols import Symbols


def resolve_optim_dtype(spec: str, batch_size: int) -> str:
    """'auto' -> bf16 second moments on any accelerator backend, f32 on CPU.

    bf16 nu is a pure HBM-bandwidth win at every batch size on the v5e:
    -6.5% step time at B=64 and -3..-11% at B=8 (20.9-23.0 ms vs 23.3-23.6,
    docs/bench_b8_pathology_r4.json). Round 3's recorded B=8 "pathology"
    (80.8 ms) turned out to be host contention on the tunneled backend, not
    an XLA scheduling interaction — see docs/PERFORMANCE.md round-4
    addendum."""
    if spec != "auto":
        return spec
    import jax

    if jax.default_backend() != "cpu":
        print("optim-dtype auto -> bf16 second moments (accelerator backend)")
        return "bf16"
    return "f32"


def get_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--accelerator", type=str, default="tpu", choices=["tpu", "cpu"])
    parser.add_argument("--devices", type=int, default=-1,
                        help="number of devices for the data-parallel mesh (-1: all)")
    parser.add_argument("--threads", type=int, default=24)
    parser.add_argument("--precision", default="bf16-mixed",
                        help="bf16-mixed (matmuls in bf16) or 32")
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("-c", "--model-config", type=str, required=True,
                        help="Path to model config.yaml")
    parser.add_argument("corpora", type=str, nargs="+", help="Path to corpus .yamls")
    parser.add_argument("--out-folder", default="mymodel1", type=str,
                        help="Output folder for checkpoints, modelcfg and validation data")
    parser.add_argument("--meldec-model", default=DEFAULT_MELDEC_MODEL_NAME, type=str)
    parser.add_argument("--name", type=str, help="run name (optional)")
    parser.add_argument("--checkpoint", default=None, type=str,
                        help="Path to model checkpoint file (torch .ckpt or native .msgpack)")
    parser.add_argument("--resume", action="store_true",
                        help="resume a killed run from the newest orbax "
                             "checkpoint in --out-folder: restores the full "
                             "TrainState (weights + Adam moments + LR "
                             "position) and continues at the next epoch "
                             "(implies --checkpoint-format orbax)")
    parser.add_argument("--keep-checkpoints", type=int, default=0,
                        help="prune to the newest N checkpoints (0 = keep all)")
    parser.add_argument("--checkpoint-every-n-epochs", type=int, default=1,
                        help="save a checkpoint every N epochs (last epoch "
                             "always saved); raise for many-epoch runs")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--train-decoder-only", action="store_true")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize FFT blocks in backward: ~30%% "
                             "more FLOPs for O(layers) less activation HBM "
                             "(enables batch sizes that otherwise OOM)")
    parser.add_argument("--remat-speaker", action="store_true",
                        help="rematerialize speaker-encoder blocks in "
                             "backward: measured ~7-9%% SLOWER on v5e but "
                             "frees the stored stem activations (memory "
                             "lever for very large batches; PERFORMANCE.md)")
    parser.add_argument("--optim-dtype", default="auto",
                        choices=["auto", "f32", "bf16"],
                        help="second-moment storage dtype: bf16 halves the "
                             "optimizer's nu HBM stream (the AdamW update "
                             "is bandwidth-bound; ~0.2%% step-size noise, "
                             "requires betas[0]=0). Measured -6.5%% step "
                             "time at B=64 on v5e. 'auto' (default) picks "
                             "bf16 on TPU at batch >= 32 and f32 otherwise "
                             "(PERFORMANCE.md)")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="capture a jax.profiler trace of the first "
                             "trained steps into DIR (view with "
                             "tensorboard --logdir DIR; compile excluded)")
    parser.add_argument("--profile-steps", type=int, default=10)
    parser.add_argument("--packed-speaker", type=int, nargs="?", const=1,
                        default=None, choices=[0, 1, 2],
                        help="2x2 space-to-depth lane packing of the speaker "
                             "encoder's first N stages (C=32 pads to 128 "
                             "lanes; 1 = stem+stage1, 2 = through stage 2's "
                             "stride-2 transition; identical math + "
                             "checkpoints at any level). Default: 1 on TPU "
                             "(-19%% step time measured on v5e), 0 elsewhere")
    parser.add_argument("--fused-speaker", type=int, nargs="?", const=1,
                        default=0, choices=[0, 1],
                        help="run the packed speaker-encoder stage 1 through "
                             "the fused Pallas conv passes (one HBM round "
                             "trip per conv, BN stats + SE squeeze in conv "
                             "epilogues, custom-VJP backward; identical math "
                             "+ checkpoints). Requires --packed-speaker >= 1")
    parser.add_argument("--data-device-cache", default="auto",
                        choices=["auto", "on", "off"],
                        help="keep the whole bucket-padded feature corpus "
                             "resident in HBM and gather batches on device "
                             "(per-step host transfer drops from MBs to the "
                             "index vector; removes the host-feed bottleneck "
                             "on tunneled TPU runtimes). auto = on for "
                             "single-process accelerator runs; corpora over "
                             "the HBM budget fall back to host loading")
    parser.add_argument("--max-epochs", type=int, default=40)
    parser.add_argument("--warmup-epochs", type=int, default=2)
    parser.add_argument("--batch-size", type=int, default=24,
                        help="per-process batch size (global = batch-size * processes)")
    parser.add_argument("--checkpoint-format", default="msgpack",
                        choices=["msgpack", "orbax"],
                        help="orbax = sharded full-TrainState checkpoints (multi-host)")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host SPMD: call jax.distributed.initialize "
                             "before building the mesh (coordinator/process "
                             "info from --coordinator-address/--num-processes/"
                             "--process-id or auto-detected on TPU pods)")
    parser.add_argument("--coordinator-address", type=str, default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    return parser.parse_args(argv)


def collect_corpora(paths) -> list[dict]:
    corpora = []
    for cfgfn in paths:
        if os.path.isdir(cfgfn):
            for cfn in sorted(os.listdir(cfgfn)):
                if os.path.splitext(cfn)[1] != ".yaml":
                    continue
                with open(os.path.join(cfgfn, cfn)) as f:
                    corpora.append(yaml.load(f, Loader=yaml.FullLoader))
        else:
            with open(cfgfn) as f:
                corpora.append(yaml.load(f, Loader=yaml.FullLoader))
    if not corpora:
        raise Exception("*** error: no .yaml files found!")
    return corpora


def merge_stats(modelcfg: dict, corpora, base_path: str) -> dict:
    """Merge per-corpus stats.json into global min/max + langs
    (reference utils/train_tts.py:152-177)."""
    modelcfg["stats"] = {
        "energy_min": sys.float_info.max,
        "energy_max": -sys.float_info.max,
        "pitch_min": sys.float_info.max,
        "pitch_max": -sys.float_info.max,
    }
    modelcfg["lang"] = []
    for corpus in corpora:
        if corpus["language"] not in modelcfg["lang"]:
            modelcfg["lang"].append(corpus["language"])
        with open(os.path.join(base_path, corpus["path"]["preprocessed_path"], "stats.json")) as f:
            stats = json.load(f)
        pmin, pmax = stats["pitch"][:2]
        emin, emax = stats["energy"][:2]
        s = modelcfg["stats"]
        s["pitch_min"] = min(s["pitch_min"], pmin)
        s["pitch_max"] = max(s["pitch_max"], pmax)
        s["energy_min"] = min(s["energy_min"], emin)
        s["energy_max"] = max(s["energy_max"], emax)
    return modelcfg


def main(argv=None):
    args = get_args(argv)

    if args.accelerator == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from zerovox_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from zerovox_tpu.parallel.mesh import MeshConfig, initialize_distributed, make_mesh
    from zerovox_tpu.training.data import SpeechDataModule
    from zerovox_tpu.training.data import preprocessed_data_path
    from zerovox_tpu.training.trainer import Trainer, TrainerConfig, device_batch

    if args.distributed:
        # multi-host SPMD over ICI/DCN (SURVEY.md §2.3): after this,
        # jax.devices() spans all processes and the data-parallel mesh +
        # shard_batch (process-local shards) work unchanged. Failures raise.
        kw = {}
        if args.coordinator_address:
            kw.update(coordinator_address=args.coordinator_address,
                      num_processes=args.num_processes,
                      process_id=args.process_id)
        initialize_distributed(strict=True, **kw)
        import jax

        print(f"distributed: process {jax.process_index()}/{jax.process_count()}, "
              f"{len(jax.devices())} global devices")

    print("collecting .yaml files from specified paths...")
    corpora = collect_corpora(args.corpora)
    print(f"{len(corpora)} corpus .yaml files found.")

    with open(args.model_config) as f:
        modelcfg = yaml.load(f, Loader=yaml.FullLoader)
    base_path = preprocessed_data_path()
    modelcfg = merge_stats(modelcfg, corpora, base_path)

    cfg = ZeroVoxConfig.from_dict(modelcfg)
    if args.packed_speaker is None:
        # lane packing wins on TPU (docs/PERFORMANCE.md round-3b: -19% step
        # time at B=8) but is extra FLOPs on CPU/GPU; checkpoint-neutral
        import jax

        args.packed_speaker = 1 if jax.default_backend() == "tpu" else 0
    if (args.remat or args.remat_speaker or args.packed_speaker
            or args.fused_speaker):
        import dataclasses

        mcfg = cfg.model
        if args.remat:
            mcfg = dataclasses.replace(mcfg, remat=True)
        if args.remat_speaker:
            mcfg = dataclasses.replace(mcfg, remat_speaker=True)
        if args.packed_speaker:
            mcfg = dataclasses.replace(mcfg, packed_speaker=args.packed_speaker)
        if args.fused_speaker:
            if not (args.packed_speaker or mcfg.packed_speaker):
                raise SystemExit("--fused-speaker requires --packed-speaker >= 1")
            mcfg = dataclasses.replace(mcfg, fused_speaker=True)
        cfg = dataclasses.replace(cfg, model=mcfg)
    symbols = Symbols(modelcfg["model"]["phones"], modelcfg["model"]["puncts"])

    os.makedirs(args.out_folder, exist_ok=True)
    modelcfg_path = (Path(args.out_folder) / f"modelcfg_{args.name}.yaml"
                     if args.name else Path(args.out_folder) / "modelcfg.yaml")
    with open(modelcfg_path, "w") as f:
        yaml.dump(modelcfg, f, default_flow_style=False)

    import jax

    if args.data_device_cache == "auto":
        # the cache pays off when per-step host->device transfer is the
        # bottleneck (any real accelerator, and especially tunneled ones);
        # multi-process runs keep host loading (process-local shard batching)
        use_device_cache = (jax.default_backend() != "cpu"
                            and jax.process_count() == 1)
    else:
        use_device_cache = args.data_device_cache == "on"

    datamodule = SpeechDataModule(
        corpora=corpora, symbols=symbols, stats=modelcfg["stats"],
        num_bins=modelcfg["model"]["encoder"]["ve_n_bins"],
        batch_size=args.batch_size, num_workers=args.num_workers * max(1, args.devices),
        seed=jax.process_index(),  # each host shuffles/loads its own shard
        device_cache=use_device_cache,
    )
    datamodule.prepare_data()
    print(f"{len(datamodule.train_dataset)} training samples")

    import jax

    n_dev = args.devices if args.devices > 0 else len(jax.devices())
    mesh = make_mesh(MeshConfig(data=n_dev), devices=jax.devices()[:n_dev])

    tcfg = TrainerConfig(
        max_epochs=args.max_epochs, warmup_epochs=args.warmup_epochs,
        batch_size=args.batch_size, out_folder=args.out_folder, name=args.name,
        train_decoder_only=args.train_decoder_only,
        precision="bf16-mixed" if "16" in str(args.precision) else "32",
        checkpoint_format="orbax" if args.resume else args.checkpoint_format,
        keep_checkpoints=args.keep_checkpoints,
        checkpoint_every_n_epochs=args.checkpoint_every_n_epochs,
        profile_dir=args.profile, profile_steps=args.profile_steps,
        optim_dtype=resolve_optim_dtype(args.optim_dtype, args.batch_size),
    )
    trainer = Trainer(cfg, tcfg, steps_per_epoch=datamodule.steps_per_epoch(), mesh=mesh)

    example = device_batch(next(iter(datamodule.train_dataloader())))
    state = trainer.init_state(example)

    start_epoch = 0
    if args.resume:
        state, start_epoch = trainer.resume_from(state)
    elif args.checkpoint:
        print(f"incremental training mode: restoring model weights from {args.checkpoint}")
        if str(args.checkpoint).endswith(".msgpack"):
            from zerovox_tpu.training.checkpointing import load_native_checkpoint

            variables = load_native_checkpoint(args.checkpoint)
        else:
            from zerovox_tpu.checkpoint import load_zerovox_checkpoint

            variables = load_zerovox_checkpoint(args.checkpoint, cfg)
            variables.pop("meldec_state_dict", None)
        state = trainer.restore_into(state, variables,
                                     reinit_decoder=args.train_decoder_only)

    trainer.fit(datamodule.train_dataloader, state, start_epoch=start_epoch)

    from zerovox_tpu.utils.compile_cache import format_cache_stats

    print(format_cache_stats())


if __name__ == "__main__":
    main()
