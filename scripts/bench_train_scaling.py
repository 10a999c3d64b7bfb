"""Training step-time vs batch size + MFU estimate (VERDICT r1 next #4).

Times the jitted SPMD train step on the tts_medium config at several batch
sizes, with NO host syncs inside the timed window. FLOPs come from XLA's
compiled cost analysis; MFU = flops / step_time / peak (v5e bf16 =
197 TFLOP/s, f32 = 49 TFLOP/s).

Timing is *forced marginal* timing: on tunneled backends
jax.block_until_ready can return before the device finishes
(utils/profiling.py:forced_device_time), so each measurement chains N
donated train steps, fences with a device_get of the final loss (in-order
device execution forces the whole chain), and reports the marginal cost
between two chain lengths — RTT and fetch constants cancel.

    python scripts/bench_train_scaling.py [--batches 8,16,32,64] [--precision bf16-mixed]

Results are recorded in docs/PERFORMANCE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PEAK_FLOPS = {"bf16-mixed": 197e12, "32": 49e12}  # TPU v5e per chip


def synth_batch(B: int, L: int, T: int, num_mels: int, rng) -> dict:
    dur = rng.integers(4, 12, size=(B, L)).astype(np.int32)
    scale = np.maximum(dur.sum(1, keepdims=True) / T, 1.0)
    dur = np.maximum((dur / scale).astype(np.int32), 1)
    mel_len = np.minimum(dur.sum(1), T)
    return {
        "phoneme": rng.integers(1, 28, (B, L)).astype(np.int32),
        "puncts": rng.integers(0, 8, (B, L)).astype(np.int32),
        "phoneme_mask": np.zeros((B, L), bool),
        "pitch": rng.uniform(0, 1, (B, L)).astype(np.float32),
        "energy": rng.uniform(0, 1, (B, L)).astype(np.float32),
        "duration": dur,
        "mel_mask": np.arange(T)[None, :] >= mel_len[:, None],
        "ref_mel": rng.normal(size=(B, 344, num_mels)).astype(np.float32),
        "mel": rng.normal(size=(B, T, num_mels)).astype(np.float32),
    }


def bench_one(B: int, args, cfg, mesh) -> dict:
    import jax

    from zerovox_tpu.parallel.mesh import shard_batch
    from zerovox_tpu.training.trainer import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    batch = synth_batch(B, args.txt_len, args.mel_len, cfg.audio.num_mels, rng)
    tcfg = TrainerConfig(max_epochs=1, batch_size=B,
                         out_folder="/tmp/zvx_scaling",
                         precision=args.precision,
                         optim_dtype=args.optim_dtype)
    trainer = Trainer(cfg, tcfg, steps_per_epoch=100, mesh=mesh)
    state = trainer.init_state(batch)
    sb = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(0)

    # compile + FLOPs estimate
    t0 = time.perf_counter()
    compiled = trainer._train_step.lower(state, sb, key).compile()
    compile_s = time.perf_counter() - t0
    flops = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    def run(n):
        nonlocal state
        losses = None
        for _ in range(2):  # warmup outside the timed window
            state, losses = trainer._train_step(state, sb, key)
        jax.device_get(losses["loss"])
        t0 = time.perf_counter()
        for _ in range(n):
            state, losses = trainer._train_step(state, sb, key)
        jax.device_get(losses["loss"])
        return time.perf_counter() - t0

    n1, n2 = max(args.steps // 4, 1), args.steps
    t1, t2 = run(n1), run(n2)
    step_s = (t2 - t1) / (n2 - n1)

    peak = PEAK_FLOPS.get(args.precision, 197e12)
    mfu = (flops / step_s / peak) if flops else None
    return {"batch": B, "ms_per_step": round(1000 * step_s, 2),
            "ms_per_sample": round(1000 * step_s / B, 3),
            "flops_per_step": flops,
            "mfu_pct": round(100 * mfu, 2) if mfu else None,
            "compile_s": round(compile_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32,64")
    ap.add_argument("--precision", default="bf16-mixed")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--txt-len", type=int, default=96)
    ap.add_argument("--mel-len", type=int, default=689)
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize FFT blocks (fits larger batches)")
    ap.add_argument("--remat-speaker", action="store_true",
                    help="rematerialize speaker-encoder blocks (measured "
                         "slower on v5e; memory lever only)")
    ap.add_argument("--optim-dtype", default="f32", choices=("f32", "bf16"),
                    help="second-moment optimizer state dtype (bf16 halves "
                         "AdamW's HBM streaming; see zerovox-train flag)")
    ap.add_argument("--packed-speaker", type=int, default=0, choices=(0, 1, 2),
                    help="speaker-encoder 2x2 lane packing level "
                         "(checkpoint-compatible; see docs/PERFORMANCE.md)")
    ap.add_argument("--fused-speaker", action="store_true",
                    help="fused Pallas stage-1 passes for the packed speaker "
                         "encoder (ops/pallas/se_fused.py; needs packing)")
    ap.add_argument("--config", default=None,
                    help="modelcfg yaml (default: built-in tts_medium); use "
                         "configs/tts_medium_tpu.yaml for the lane-aligned "
                         "punct-fold variant")
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    from zerovox_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax

    from zerovox_tpu.config import ZeroVoxConfig
    from zerovox_tpu.parallel.mesh import MeshConfig, make_mesh

    if args.config:
        import yaml

        with open(args.config) as f:
            cfg = ZeroVoxConfig.from_dict(yaml.safe_load(f))
    else:
        cfg = ZeroVoxConfig()  # tts_medium
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
            mcfg = dataclasses.replace(mcfg, fused_speaker=True)
        cfg = dataclasses.replace(cfg, model=mcfg)
    mesh = make_mesh(MeshConfig(data=1), devices=jax.devices()[:1])

    rows = []
    for B in [int(b) for b in args.batches.split(",")]:
        try:
            rows.append(bench_one(B, args, cfg, mesh))
        except Exception as e:  # e.g. HBM OOM at large batch
            rows.append({"batch": B, "error": str(e).splitlines()[0][:200]})
        print(rows[-1], file=sys.stderr, flush=True)

    print(json.dumps({"precision": args.precision, "txt_len": args.txt_len,
                      "mel_len": args.mel_len, "rows": rows}))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump({"precision": args.precision, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
