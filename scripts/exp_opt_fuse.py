"""Optimizer bandwidth-floor A/B (VERDICT r3 task #7).

The round-3 roofline (docs/bench_decomp_r3b_packed.json) has the AdamW
update at 5.7 ms / ~5.4 GB — a pure HBM stream at 0.1% MFU. The state is
already minimal (mu-free b1=0 lowering, opt-in bf16 nu), so what's left is
whether the *schedule* around the stream wastes passes:

  chain    production optax chain (clip -> mu-free adam -> wd -> lr)
  noclip   drop clip_by_global_norm: isolates the cost of the global-norm
           barrier + its extra read of every gradient leaf
  fused    the whole update as ONE hand-written transform: norm, clip
           scale, nu EMA, bias correction, weight decay and lr folded into
           a single per-leaf expression (tests optax.chain's per-transform
           tree.maps against one pass; math identical to `chain`)
  bf16g    cast each gradient leaf to bf16 before the optimizer and upcast
           inside it: if XLA materializes the f32 gradient tree between
           backward and optimizer, the cast halves that write+read pair
           (~4 bytes/param of the ~16); ~0.4% relative rounding enters one
           step's update direction

All variants run the REAL jitted train step at B=8 with --packed-speaker 1
--optim-dtype bf16 (the round-4 production config, 22.98 ms baseline in
docs/bench_scaling_r4_packed1_obf16_b8.json). Timing via forced marginal
chains (utils/profiling.py) like every step bench in this repo.

    python scripts/exp_opt_fuse.py --out-json docs/bench_opt_fuse_r4.json

Matches the reference's training recipe surface (zerovox/tts/model.py:
120-156 configure_optimizers); the scheduling question is TPU-only.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

SCRIPTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(SCRIPTS)
sys.path.insert(0, REPO)
sys.path.insert(0, SCRIPTS)

from exp_b8_pathology import synth_batch, timed_step  # noqa: E402


def fused_adamw_no_mu(learning_rate, weight_decay, b2, eps, grad_clip,
                      state_dtype):
    """clip+adam(no-mu)+wd+lr as one transform with a single per-leaf pass
    after the (unavoidable) global-norm barrier. Math is identical to
    optim.make_optimizer's b1==0 chain."""
    import jax
    import jax.numpy as jnp
    import optax

    from zerovox_tpu.training.optim import ScaleByNuState

    def init_fn(params):
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=state_dtype or p.dtype), params)
        return ScaleByNuState(count=jnp.zeros([], jnp.int32), nu=nu)

    def update_fn(updates, state, params=None):
        gsq = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                  for g in jax.tree.leaves(updates))
        gnorm = jnp.sqrt(gsq)
        cscale = jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-16))
        count = optax.safe_increment(state.count)
        bc = 1.0 - b2 ** count.astype(jnp.float32)
        lr = learning_rate(count - 1) if callable(learning_rate) \
            else learning_rate

        def leaf(g, n, p):
            gc = g * cscale
            n32 = b2 * n.astype(jnp.float32) + (1.0 - b2) * (gc * gc)
            upd = gc / (jnp.sqrt(n32 / bc) + eps) + weight_decay * p
            return -lr * upd, n32

        out = jax.tree.map(leaf, updates, state.nu, params)
        upds = jax.tree.map(lambda o: o[0], out,
                            is_leaf=lambda x: isinstance(x, tuple))
        nu32 = jax.tree.map(lambda o: o[1], out,
                            is_leaf=lambda x: isinstance(x, tuple))
        nu = (nu32 if state_dtype is None else
              jax.tree.map(lambda n, s: n.astype(s.dtype), nu32, state.nu))
        return upds, ScaleByNuState(count=count, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


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
    import jax.numpy as jnp
    import optax

    from zerovox_tpu.config import ZeroVoxConfig
    from zerovox_tpu.parallel.mesh import MeshConfig, make_mesh, shard_batch
    from zerovox_tpu.training.trainer import (Trainer, TrainerConfig,
                                              make_train_step)

    cfg = ZeroVoxConfig()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, packed_speaker=1))
    mesh = make_mesh(MeshConfig(data=1), devices=jax.devices()[:1])

    B = args.batch
    rng = np.random.default_rng(0)
    batch = synth_batch(B, args.txt_len, args.mel_len, cfg.audio.num_mels,
                        rng)
    key = jax.random.PRNGKey(0)
    rows = {}

    tcfg = TrainerConfig(max_epochs=1, batch_size=B,
                         out_folder="/tmp/zvx_optfuse",
                         precision="bf16-mixed", optim_dtype="bf16")
    trainer = Trainer(cfg, tcfg, steps_per_epoch=100, mesh=mesh)
    tr = cfg.training

    def measure(name, tx):
        trainer.tx = tx
        step = make_train_step(trainer.model, tx, precision="bf16-mixed")
        state = trainer.init_state(batch)
        sb = shard_batch(batch, mesh)
        try:
            ms = 1000 * timed_step(step, state, sb, key, args.steps)
            rows[name] = round(ms, 2)
        except Exception as e:
            rows[name] = f"error: {str(e).splitlines()[0][:150]}"
        print(f"{name}: {rows[name]}", file=sys.stderr, flush=True)
        del state

    from zerovox_tpu.training.optim import (_scale_by_adam_no_mu,
                                            make_optimizer)

    chain = make_optimizer(learning_rate=trainer.schedule,
                           weight_decay=tr.weight_decay,
                           betas=tuple(tr.betas), eps=tr.eps,
                           grad_clip=tr.grad_clip, state_dtype="bf16")

    # validity gate: the fused transform must produce the chain's updates
    # bit-for-bit-close on a toy tree before its timing means anything
    with jax.default_device(jax.devices("cpu")[0]):
        k = jax.random.PRNGKey(3)
        p0 = {"a": jax.random.normal(k, (37, 5)),
              "b": jax.random.normal(jax.random.fold_in(k, 1), (11,))}
        g0 = jax.tree.map(lambda p: 3.0 * p + 0.1, p0)  # norm > clip
        fus = fused_adamw_no_mu(trainer.schedule, tr.weight_decay,
                                tr.betas[1], tr.eps, tr.grad_clip, None)
        chain32 = make_optimizer(learning_rate=trainer.schedule,
                                 weight_decay=tr.weight_decay,
                                 betas=tuple(tr.betas), eps=tr.eps,
                                 grad_clip=tr.grad_clip, state_dtype="f32")
        sa, sb_ = chain32.init(p0), fus.init(p0)
        for _ in range(3):
            ua, sa = chain32.update(g0, sa, p0)
            ub, sb_ = fus.update(g0, sb_, p0)
        for la, lb in zip(jax.tree.leaves(ua), jax.tree.leaves(ub)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-5, atol=1e-8)
        print("fused == chain on toy tree: ok", file=sys.stderr)

    measure("chain", chain)

    noclip = optax.chain(
        _scale_by_adam_no_mu(b2=tr.betas[1], eps=tr.eps,
                             state_dtype=jnp.bfloat16),
        optax.add_decayed_weights(tr.weight_decay),
        optax.scale_by_learning_rate(trainer.schedule),
    )
    measure("noclip", noclip)

    measure("fused", fused_adamw_no_mu(
        trainer.schedule, tr.weight_decay, tr.betas[1], tr.eps,
        tr.grad_clip, jnp.bfloat16))

    bf16g = optax.chain(
        optax.stateless(lambda u, p: jax.tree.map(
            lambda g: g.astype(jnp.bfloat16).astype(jnp.float32), u)),
        chain,
    )
    measure("bf16g", bf16g)

    out = {"batch": B, "config": "packed1+optim-bf16, bf16-mixed",
           "baseline_ms": 22.98, "rows": rows}
    print(json.dumps(out, indent=1))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
