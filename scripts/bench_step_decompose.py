"""Train-step component decomposition: where does the non-MXU time go?

Times each component of the training step in isolation on the real chip
(forced marginal timing — see utils/profiling.py:forced_device_time) and
pairs every measurement with XLA's compiled cost analysis (flops + HBM
bytes), yielding a per-component roofline: MFU vs the 197 TFLOP/s bf16
peak and HBM-bandwidth utilization vs the v5e's 819 GB/s. This is the
mechanism-level answer to "MFU plateaus at ~40% — what is the other 60%?"
(round-2 VERDICT weak #1).

Components (tts_medium shapes, bf16-mixed exactly like the real step):
  full        jitted train step (fwd + bwd + AdamW), donated
  grad        fwd + bwd only (jax.grad of the real loss_fn)
  fwd         forward + loss only
  spk_fwd     speaker encoder (ResNetSE34V2) forward on ref_mel
  spk_grad    speaker encoder forward + backward
  enc_fwd     phoneme encoder + variance adaptor forward (teacher targets)
  enc_grad    ... + backward
  dec_fwd     mel decoder forward on length-regulated features
  dec_grad    ... + backward
  loss        zerovox_loss on fixed predictions
  opt         AdamW update + apply_updates on fixed grads

    python scripts/bench_step_decompose.py [--batch 8] [--mel-len 768] \
        [--config configs/tts_medium_tpu.yaml] [--out-json ...]

Results recorded in docs/PERFORMANCE.md (round 3).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench_train_scaling import PEAK_FLOPS, synth_batch  # noqa: E402

HBM_BYTES_PER_S = 819e9  # TPU v5e


def _cost(compiled):
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return (float(ca.get("flops", 0.0)) or None,
                float(ca.get("bytes accessed", 0.0)) or None)
    except Exception:
        return None, None


def measure(name, fn, args, probe, results, iters=(4, 16)):
    """Compile fn(*args), record cost analysis, and time it forced."""
    import jax

    from zerovox_tpu.utils.profiling import forced_device_time

    compiled = jax.jit(fn).lower(*args).compile()
    flops, bytes_ = _cost(compiled)
    sec = forced_device_time(lambda: compiled(*args), probe, iters=iters)
    row = {
        "component": name,
        "ms": round(1000 * sec, 3),
        "tflop": round(flops / 1e12, 4) if flops else None,
        "gbytes": round(bytes_ / 1e9, 3) if bytes_ else None,
        "mfu_pct": round(100 * flops / sec / PEAK_FLOPS["bf16-mixed"], 1)
        if flops and sec else None,
        "hbm_pct": round(100 * bytes_ / sec / HBM_BYTES_PER_S, 1)
        if bytes_ and sec else None,
    }
    results.append(row)
    print(row, flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--txt-len", type=int, default=96)
    ap.add_argument("--mel-len", type=int, default=768)
    ap.add_argument("--config", default=None)
    ap.add_argument("--packed-speaker", type=int, default=0, choices=(0, 1, 2),
                    help="speaker-encoder 2x2 lane packing level")
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    from zerovox_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from zerovox_tpu.config import ZeroVoxConfig
    from zerovox_tpu.models.zerovox import ZeroVox, zerovox_loss
    from zerovox_tpu.training.trainer import Trainer, TrainerConfig

    if args.config:
        import yaml

        with open(args.config) as f:
            cfg = ZeroVoxConfig.from_dict(yaml.safe_load(f))
    else:
        cfg = ZeroVoxConfig()
    if args.packed_speaker:
        import dataclasses

        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, packed_speaker=args.packed_speaker))

    B = args.batch
    rng = np.random.default_rng(0)
    batch = synth_batch(B, args.txt_len, args.mel_len, cfg.audio.num_mels, rng)

    tcfg = TrainerConfig(max_epochs=1, batch_size=B,
                         out_folder="/tmp/zvx_decomp", precision="bf16-mixed")
    trainer = Trainer(cfg, tcfg, steps_per_epoch=100)
    state = trainer.init_state(batch)
    model: ZeroVox = trainer.model
    tx = trainer.tx

    dev = jax.devices()[0]
    dbatch = {k: jax.device_put(jnp.asarray(v), dev) for k, v in batch.items()}
    key = jax.random.PRNGKey(0)

    def half(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    params, stats = state.params, state.batch_stats
    hparams, hbatch = half(params), half(dbatch)

    results: list[dict] = []

    # ---- full step (donated chain exactly like the real trainer)
    from zerovox_tpu.utils.profiling import forced_device_time

    compiled_full = trainer._train_step.lower(state, dbatch, key).compile()
    flops, bytes_ = _cost(compiled_full)
    st = {"s": state}

    def disp_full():
        st["s"], losses = trainer._train_step(st["s"], dbatch, key)
        return losses

    sec = forced_device_time(disp_full, lambda ls: ls["loss"])
    row = {"component": "full", "ms": round(1000 * sec, 3),
           "tflop": round(flops / 1e12, 4) if flops else None,
           "gbytes": round(bytes_ / 1e9, 3) if bytes_ else None,
           "mfu_pct": round(100 * flops / sec / PEAK_FLOPS["bf16-mixed"], 1)
           if flops else None,
           "hbm_pct": round(100 * bytes_ / sec / HBM_BYTES_PER_S, 1)
           if bytes_ else None}
    results.append(row)
    print(row, flush=True)
    state = st["s"]
    params, stats = state.params, state.batch_stats
    hparams = half(params)

    # ---- real loss_fn (matches make_train_step's mixed-precision recipe)
    def loss_fn(p):
        outs, mutated = model.apply(
            {"params": half(p), "batch_stats": stats}, hbatch, train=True,
            rngs={"dropout": key}, mutable=["batch_stats"])
        outs = jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, outs)
        losses = zerovox_loss(outs, dbatch)
        return losses["loss"], losses

    measure("fwd", lambda p: loss_fn(p)[0], (params,), lambda x: x, results)
    measure("grad", lambda p: jax.grad(lambda q: loss_fn(q)[0])(p),
            (params,), lambda g: jax.tree.leaves(g)[0].reshape(-1)[0], results)

    # ---- speaker encoder
    def spk_fwd(p, ref):
        out, _ = model.apply({"params": p, "batch_stats": stats}, ref,
                             train=True, mutable=["batch_stats"],
                             method=ZeroVox.speaker_embed)
        return out

    measure("spk_fwd", spk_fwd, (hparams, hbatch["ref_mel"]),
            lambda o: o.reshape(-1)[0], results)
    measure("spk_grad",
            lambda p, ref: jax.grad(
                lambda q: spk_fwd(q, ref).sum().astype(jnp.float32))(p),
            (hparams, hbatch["ref_mel"]),
            lambda g: jax.tree.leaves(g)[0].reshape(-1)[0], results)

    # ---- phoneme encoder + variance adaptor (teacher-forced, like training)
    emb = jnp.asarray(
        rng.normal(size=(B, 1, cfg.model.emb_size)), dtype=jnp.bfloat16)

    def enc_fwd(p, b, style):
        pred = model.apply(
            {"params": p, "batch_stats": stats},
            b["phoneme"], b["puncts"], style,
            max_mel_len=args.mel_len,
            phoneme_mask=b["phoneme_mask"],
            pitch_target=b["pitch"], energy_target=b["energy"],
            duration_target=b["duration"], mel_mask=b["mel_mask"],
            deterministic=False, rngs={"dropout": key},
            method=lambda m, *a, **kw: m.phoneme_encoder(*a, **kw))
        return pred["features"]

    measure("enc_fwd", enc_fwd, (hparams, hbatch, emb),
            lambda o: o.reshape(-1)[0], results)
    measure("enc_grad",
            lambda p, b, s: jax.grad(
                lambda q: enc_fwd(q, b, s).sum().astype(jnp.float32))(p),
            (hparams, hbatch, emb),
            lambda g: jax.tree.leaves(g)[0].reshape(-1)[0], results)

    # ---- mel decoder on length-regulated features
    feats = enc_fwd(hparams, hbatch, emb)
    feats = jax.device_put(jax.block_until_ready(feats), dev)
    mel_mask = hbatch["mel_mask"]

    def dec_fwd(p, f, mask, style):
        return model.apply(
            {"params": p, "batch_stats": stats}, f, mask, style, False,
            rngs={"dropout": key},
            method=lambda m, *a: m.mel_decoder(*a))

    measure("dec_fwd", dec_fwd, (hparams, feats, mel_mask, emb),
            lambda o: o.reshape(-1)[0], results)
    measure("dec_grad",
            lambda p, f, mask, s: jax.grad(
                lambda q: dec_fwd(q, f, mask, s).sum().astype(jnp.float32))(p),
            (hparams, feats, mel_mask, emb),
            lambda g: jax.tree.leaves(g)[0].reshape(-1)[0], results)

    # ---- loss + optimizer on fixed inputs
    grads = jax.jit(jax.grad(lambda p: loss_fn(p)[0]))(params)
    grads = jax.device_put(jax.block_until_ready(grads), dev)

    def opt_step(g, o, p):
        updates, new_o = tx.update(g, o, p)
        return optax.apply_updates(p, updates), new_o

    measure("opt", opt_step, (grads, state.opt_state, params),
            lambda out: jax.tree.leaves(out[0])[0].reshape(-1)[0], results)

    pred = jax.jit(lambda p: model.apply(
        {"params": half(p), "batch_stats": stats}, hbatch, train=True,
        rngs={"dropout": key}, mutable=["batch_stats"])[0])(params)
    pred = jax.tree.map(lambda x: jax.device_put(
        jax.block_until_ready(x).astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, dev), pred)
    measure("loss", lambda pr, b: zerovox_loss(pr, b)["loss"],
            (pred, dbatch), lambda x: x, results)

    out = {"batch": B, "txt_len": args.txt_len, "mel_len": args.mel_len,
           "config": args.config or "tts_medium", "rows": results}
    print(json.dumps(out))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
