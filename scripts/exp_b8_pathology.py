"""Diagnose the B=8 `--packed-speaker 1 --optim-dtype bf16` pathology.

PERFORMANCE.md round-3 recorded that packed SE + bf16 second-moment state
each win alone at B=8 (23.3 / 28.0 ms) but *combined* compile to an 80.8 ms
schedule — batch-independent optimizer work tripling the step points at an
XLA scheduling interaction, not a bandwidth effect. This script A/Bs
schedule-shaping variants of the SAME math in ONE process (one first-contact
cost) to localize the interaction:

  f32          packed=1, f32 nu            (reference point, ~23 ms)
  bf16         packed=1, bf16 nu           (the pathology, ~81 ms)
  bf16+barrier optimization_barrier on grads before tx.update — forbids XLA
               from interleaving optimizer streaming into the backward
  bf16-nolhs   latency-hiding scheduler disabled via jit compiler_options
  bf16-nodon   donation off (buffer aliasing changes the scheduler's view)

Timing: forced marginal chains (utils/profiling.py rationale) — this
backend's block_until_ready is not an execution fence.

    python scripts/exp_b8_pathology.py [--batch 8] [--steps 16]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

SCRIPTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPTS)
sys.path.insert(0, REPO)
sys.path.insert(0, SCRIPTS)

from bench_train_scaling import synth_batch  # noqa: E402  (same dir)


def timed_step(step_fn, state, sb, key, steps):
    import jax

    def run(n):
        nonlocal state
        losses = None
        for _ in range(2):
            state, losses = step_fn(state, sb, key)
        jax.device_get(losses["loss"])
        t0 = time.perf_counter()
        for _ in range(n):
            state, losses = step_fn(state, sb, key)
        jax.device_get(losses["loss"])
        return time.perf_counter() - t0

    n1 = max(steps // 4, 1)
    n2 = max(steps, n1 + 1)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--mel-len", type=int, default=689)
    ap.add_argument("--txt-len", type=int, default=96)
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    from zerovox_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import optax

    from zerovox_tpu.config import ZeroVoxConfig
    from zerovox_tpu.parallel.mesh import MeshConfig, make_mesh, shard_batch
    from zerovox_tpu.training.trainer import Trainer, TrainerConfig, make_train_step

    cfg = ZeroVoxConfig()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, packed_speaker=1))
    mesh = make_mesh(MeshConfig(data=1), devices=jax.devices()[:1])

    B = args.batch
    rng = np.random.default_rng(0)
    batch = synth_batch(B, args.txt_len, args.mel_len, cfg.audio.num_mels, rng)
    key = jax.random.PRNGKey(0)

    rows = {}

    def measure(name, trainer, step_fn=None):
        state = trainer.init_state(batch)
        sb = shard_batch(batch, mesh)
        fn = step_fn or trainer._train_step
        try:
            ms = 1000 * timed_step(fn, state, sb, key, args.steps)
            rows[name] = round(ms, 2)
        except Exception as e:  # unsupported compiler option etc.
            rows[name] = f"error: {str(e).splitlines()[0][:150]}"
        print(f"{name}: {rows[name]}", file=sys.stderr, flush=True)
        del state

    def trainer_for(optim_dtype):
        tcfg = TrainerConfig(max_epochs=1, batch_size=B,
                             out_folder="/tmp/zvx_b8path",
                             precision="bf16-mixed", optim_dtype=optim_dtype)
        return Trainer(cfg, tcfg, steps_per_epoch=100, mesh=mesh)

    # 1+2: the recorded endpoints, re-measured in this process
    measure("f32", trainer_for("f32"))
    tr = trainer_for("bf16")
    measure("bf16", tr)

    # 3: barrier between backward and optimizer (same tx math)
    def barrier_tx(tx):
        def update(grads, opt_state, params=None):
            grads = jax.lax.optimization_barrier(grads)
            return tx.update(grads, opt_state, params)
        return optax.GradientTransformation(tx.init, update)

    step_b = make_train_step(tr.model, barrier_tx(tr.tx), precision="bf16-mixed")
    measure("bf16+barrier", tr, step_b)

    # 4+5: same body, different jit wrapping.
    body = make_train_step(tr.model, tr.tx, precision="bf16-mixed", jit=False)

    for name, opts in [
        ("bf16-nolhs", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
        ("bf16-nodon", None),
    ]:
        if opts is None:
            fn = jax.jit(body)  # no donation
        else:
            try:
                fn = jax.jit(body, donate_argnums=(0,), compiler_options=opts)
            except TypeError:
                rows[name] = "error: compiler_options unsupported"
                continue
        measure(name, tr, fn)

    out = {"batch": B, "mel_len": args.mel_len, "rows": rows}
    print(json.dumps(out))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
