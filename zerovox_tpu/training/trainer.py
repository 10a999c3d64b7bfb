"""Training loop: jitted SPMD train step, epoch driver, logging, checkpoints.

Replaces the reference's Lightning Trainer (utils/train_tts.py:298-310,
model.py:411-459) with a TPU-native loop:

  * one jitted train step (forward + loss + AdamW update) compiled per batch
    bucket, data-parallel over a `jax.sharding.Mesh` — XLA inserts the
    gradient all-reduce over ICI (no DDP/NCCL);
  * loss semantics identical to the reference (models/zerovox.py:zerovox_loss:
    masked L1 mel + MSE pitch/energy/log-duration, 10/2/2/1 weights);
  * decoder-only finetune mode freezes/excludes everything but the mel
    decoder (reference utils/train_tts.py:256-277 semantics);
  * per-step scalar logging to TensorBoard (tensorboardX) + epoch averages,
    RSS memory print per epoch (reference model.py:437-442);
  * per-epoch checkpoints keyed on train loss (reference
    ZVModelCheckpointCheckpoint, utils/train_tts.py:112-119, 280-291):
    portable flax-msgpack files by default, or orbax sharded checkpoints
    of the full TrainState (TrainerConfig.checkpoint_format="orbax") for
    multi-host / resumable optimizer state.
"""

from __future__ import annotations

import gc
import os
import time
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from zerovox_tpu.config import ZeroVoxConfig
from zerovox_tpu.models.zerovox import ZeroVox, zerovox_loss
from zerovox_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from zerovox_tpu.training.optim import make_optimizer, warmup_cosine_epoch_schedule


_DEVICE_KEYS = ("phoneme", "puncts", "phoneme_mask", "pitch", "energy",
                "duration", "mel_mask", "ref_mel", "mel")


def device_batch(batch) -> dict:
    """Normalize a data-module batch ((x, y) tuple or dict) into the flat
    array-only dict the jitted train step consumes."""
    if isinstance(batch, tuple):
        x, y = batch
        batch = {**x, **y}
    return {k: batch[k] for k in _DEVICE_KEYS if k in batch}


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def decoder_only_labels(params) -> Any:
    """'train' for mel-decoder params, 'freeze' for the rest
    (reference --train-decoder-only, utils/train_tts.py:256-277)."""
    return {
        k: jax.tree.map(lambda _: "train" if k == "mel_decoder" else "freeze", v)
        for k, v in params.items()
    }


def make_train_step(
    model: ZeroVox,
    tx: optax.GradientTransformation,
    train_decoder_only: bool = False,
    precision: str = "32",
    jit: bool = True,
) -> Callable:
    """precision="bf16-mixed" runs the forward/backward in bfloat16 with f32
    master weights and f32 optimizer state (the TPU analogue of the
    reference's Lightning `--precision 16-mixed` default,
    utils/train_tts.py:51; bf16 needs no loss scaling).

    jit=False returns the raw step body (for schedule experiments that want
    to re-wrap it with different jit options, e.g. scripts/exp_b8_pathology.py)."""
    mixed = precision in ("bf16-mixed", "bf16", "16-mixed")

    def _half(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        comp_batch = _half(batch) if mixed else batch

        def loss_fn(params):
            comp_params = _half(params) if mixed else params
            outs, mutated = model.apply(
                {"params": comp_params, "batch_stats": state.batch_stats},
                comp_batch,
                train=True,
                spkemb_train=not train_decoder_only,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            if mixed:
                outs = jax.tree.map(
                    lambda x: x.astype(jnp.float32)
                    if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, outs)
            losses = zerovox_loss(outs, batch)
            return losses["loss"], (losses, mutated["batch_stats"])

        grads, (losses, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if train_decoder_only:
            new_stats = state.batch_stats  # frozen spkemb keeps its stats
        elif mixed:
            # keep running statistics in f32 regardless of compute dtype
            new_stats = jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, new_stats)

        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, losses

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,))


@dataclass
class TrainerConfig:
    max_epochs: int = 40
    warmup_epochs: int = 2
    batch_size: int = 24
    out_folder: str = "mymodel1"
    name: str | None = None
    # per-step device->host loss fetches block the dispatch stream (~30 ms
    # RTT on remote TPU backends — a third of a measured 97 ms step), so
    # scalars are fetched every N steps and epoch averages are computed from
    # one batched device_get at epoch end
    log_every_n_steps: int = 50
    keep_checkpoints: int = 0  # 0 = keep all (reference save_top_k=max_epochs)
    # checkpoint every N epochs (always incl. the last). Beyond IO, each save
    # device_gets the full param tree; on tunneled backends those per-epoch
    # bulk fetches dominate short-epoch runs and grow host RSS, so long
    # many-epoch jobs should raise this.
    checkpoint_every_n_epochs: int = 1
    train_decoder_only: bool = False
    precision: str = "32"  # "32" | "bf16-mixed"
    checkpoint_format: str = "msgpack"  # "msgpack" | "orbax" (sharded TrainState)
    seed: int = 42
    # jax.profiler trace capture (view with tensorboard / xprof): traces
    # `profile_steps` steps of the first trained epoch, starting AFTER the
    # first step so the compile isn't in the capture window
    profile_dir: str | None = None
    profile_steps: int = 10
    # second-moment storage dtype ('f32' | 'bf16'): the AdamW update is a
    # pure HBM-bandwidth floor (PERFORMANCE.md roofline), so bf16 nu halves
    # another params-sized read+write pair; ~0.2% step-size noise, no
    # direction bias (see optim._scale_by_adam_no_mu)
    optim_dtype: str = "f32"


class Trainer:
    """Epoch-driven trainer over an iterable of host batches."""

    def __init__(self, cfg: ZeroVoxConfig, tcfg: TrainerConfig, steps_per_epoch: int,
                 mesh=None):
        self.cfg = cfg
        self.tcfg = tcfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.model = ZeroVox(cfg)

        self.schedule = warmup_cosine_epoch_schedule(
            base_lr=cfg.training.learning_rate,
            warmup_epochs=tcfg.warmup_epochs,
            total_epochs=tcfg.max_epochs,
            steps_per_epoch=steps_per_epoch,
        )
        base_tx = make_optimizer(
            learning_rate=self.schedule,
            weight_decay=cfg.training.weight_decay,
            betas=tuple(cfg.training.betas),
            eps=cfg.training.eps,
            grad_clip=cfg.training.grad_clip,
            state_dtype=tcfg.optim_dtype,
        )
        self._labels_needed = tcfg.train_decoder_only
        self.tx = base_tx

        self._writer = None
        self._ckpt_dir = None

    # ------------------------------------------------------------- lifecycle

    def init_state(self, example_batch: dict, rng: jax.Array | None = None,
                   init_variables: dict | None = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.tcfg.seed)
        if init_variables is None:
            variables = self.model.init({"params": rng}, example_batch, train=False)
        else:
            variables = init_variables
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        if self.tcfg.train_decoder_only:
            self.tx = optax.multi_transform(
                {"train": self.tx, "freeze": optax.set_to_zero()},
                decoder_only_labels(params),
            )

        if self.mesh.shape.get("model", 1) > 1:
            # tensor parallel: wide matmul kernels shard over the `model`
            # axis (parallel/mesh.py rules); optimizer moments are created
            # from the placed params below and inherit their shardings, so
            # Adam state shards with the weights it tracks
            from zerovox_tpu.parallel.mesh import param_sharding_rules

            params = jax.tree.map(jax.device_put, params,
                                  param_sharding_rules(params, self.mesh))
            batch_stats = replicate(batch_stats, self.mesh)
            opt_state = self.tx.init(params)
            state = TrainState(params=params, batch_stats=batch_stats,
                               opt_state=opt_state,
                               step=replicate(jnp.zeros((), jnp.int32), self.mesh))
        else:
            opt_state = self.tx.init(params)
            state = TrainState(params=params, batch_stats=batch_stats,
                               opt_state=opt_state, step=jnp.zeros((), jnp.int32))
            state = replicate(state, self.mesh)
        self._train_step = make_train_step(self.model, self.tx,
                                           train_decoder_only=self.tcfg.train_decoder_only,
                                           precision=self.tcfg.precision)
        return state

    def restore_into(self, state: TrainState, variables: dict,
                     reinit_decoder: bool = False) -> TrainState:
        """Manual partial restore (reference utils/train_tts.py:246-278):
        imported weights replace the current ones; with `reinit_decoder` the
        mel decoder keeps its fresh random init instead."""
        params = dict(variables["params"])
        if reinit_decoder:
            params["mel_decoder"] = state.params["mel_decoder"]
        batch_stats = variables.get("batch_stats", state.batch_stats)
        params = jax.tree.map(jnp.asarray, params)
        return state.replace(params=params, batch_stats=batch_stats)

    # --------------------------------------------------------------- logging

    def _get_writer(self):
        if self._writer is None:
            if jax.process_index() != 0:  # one tensorboard writer per job
                self._writer = False
                return self._writer
            try:
                from tensorboardX import SummaryWriter

                logdir = os.path.join(self.tcfg.out_folder, "lightning_logs")
                if self.tcfg.name:
                    logdir = os.path.join(logdir, self.tcfg.name)
                self._writer = SummaryWriter(logdir)
            except Exception:
                self._writer = False
        return self._writer

    def _log_scalars(self, scalars: dict, step: int):
        w = self._get_writer()
        if w:
            for k, v in scalars.items():
                w.add_scalar(k, float(v), step)

    # ---------------------------------------------------------------- epochs

    def checkpoint_root(self) -> str:
        ckpt_root = os.path.join(self.tcfg.out_folder, "checkpoints")
        if self.tcfg.name:
            ckpt_root = os.path.join(ckpt_root, self.tcfg.name)
        return ckpt_root

    def resume_from(self, state: TrainState, ckpt_root: str | None = None
                    ) -> tuple[TrainState, int]:
        """Restore the FULL TrainState (params + Adam moments + step) from
        the newest orbax checkpoint under `ckpt_root`/orbax and return
        (state, start_epoch) for `fit`. The reference can only re-import
        weights (utils/train_tts.py:246-278 manual state-dict surgery);
        this resumes optimizer state and LR position too."""
        from zerovox_tpu.training.checkpointing import latest_orbax_step, restore_orbax

        ckpt_root = ckpt_root or self.checkpoint_root()
        orbax_dir = os.path.join(ckpt_root, "orbax")
        epoch = latest_orbax_step(orbax_dir)
        if epoch is None:
            raise FileNotFoundError(f"no orbax checkpoints under {orbax_dir}")
        state = restore_orbax(orbax_dir, state, step=epoch)
        self._host_step = int(jax.device_get(state.step))
        print(f"resumed from {orbax_dir} at epoch {epoch} "
              f"(step {self._host_step}); continuing at epoch {epoch + 1}")
        return state, epoch + 1

    def fit(self, batches_per_epoch: Callable[..., Any], state: TrainState,
            start_epoch: int = 0) -> TrainState:
        """`batches_per_epoch()` yields host batch dicts for one epoch.
        Loaders that accept an argument are passed the epoch index so data
        order is a function of the epoch, not process history (resume
        determinism — SpeechDataModule.train_dataloader(epoch))."""
        import inspect

        try:
            loader_takes_epoch = bool(inspect.signature(batches_per_epoch).parameters)
        except (TypeError, ValueError):
            loader_takes_epoch = False

        rng = jax.random.PRNGKey(self.tcfg.seed + 1)
        ckpt_root = self.checkpoint_root()
        os.makedirs(ckpt_root, exist_ok=True)

        host_step = getattr(self, "_host_step", 0)
        profile_after = (host_step + 1 if self.tcfg.profile_dir else None)
        tracing = False
        for epoch in range(start_epoch, self.tcfg.max_epochs):
            t0 = time.time()
            # device scalars accumulated without blocking; fetched in one
            # batched device_get at epoch end (and every log_every_n_steps
            # for tensorboard/NaN checks)
            pending: list[dict] = []
            checked = 0
            for batch in (batches_per_epoch(epoch) if loader_takes_epoch
                          else batches_per_epoch()):
                if profile_after is not None and host_step == profile_after:
                    jax.profiler.start_trace(self.tcfg.profile_dir)
                    tracing = True
                batch = device_batch(batch)
                batch = shard_batch(batch, self.mesh)
                state, losses = self._train_step(state, batch, rng)
                host_step += 1
                pending.append(losses)
                if tracing and host_step >= profile_after + self.tcfg.profile_steps:
                    jax.block_until_ready(losses)
                    jax.profiler.stop_trace()
                    tracing = False
                    profile_after = None
                    print(f"profiler trace ({self.tcfg.profile_steps} steps) "
                          f"written to {self.tcfg.profile_dir}")
                if host_step % self.tcfg.log_every_n_steps == 0:
                    # one batched device_get of EVERY step since the last
                    # gate, so a NaN at any step (not just every Nth) is
                    # caught at the next gate (reference model.py:431-432
                    # checks per step; we were keeping the scalars on
                    # device anyway for the epoch average)
                    window = jax.device_get(pending[checked:])
                    checked = len(pending)
                    self._check_finite(window, host_step)
                    host_losses = window[-1]
                    self._log_scalars(
                        {"loss": host_losses["loss"], "mel": host_losses["mel_loss"],
                         "pitch": host_losses["pitch_loss"], "energy": host_losses["energy_loss"],
                         "dur": host_losses["duration_loss"]},
                        host_step,
                    )

            epoch_losses = [
                {k: float(v) for k, v in d.items()}
                for d in jax.device_get(pending)
            ]
            self._check_finite(epoch_losses[checked:], host_step)
            self._host_step = host_step
            self._on_epoch_end(epoch, epoch_losses, state, ckpt_root, t0)
        if tracing:  # run shorter than profile window
            jax.profiler.stop_trace()
        return state

    @staticmethod
    def _check_finite(host_losses: list, host_step: int) -> None:
        """Flag non-finite losses in a fetched window of per-step scalars
        (reference's per-step duration NaN/Inf print, model.py:431-432)."""
        for i, d in enumerate(host_losses):
            bad = [k for k, v in d.items() if not np.isfinite(v)]
            if bad:
                step = host_step - len(host_losses) + 1 + i
                print(f"*** error: invalid loss detected at step {step}: "
                      + ", ".join(f"{k}={float(d[k])}" for k in bad))

    def _on_epoch_end(self, epoch, epoch_losses, state, ckpt_root, t0):
        from zerovox_tpu.training.checkpointing import save_native_checkpoint

        gc.collect()
        try:
            import psutil

            rss = psutil.Process(os.getpid()).memory_info().rss / (1024 * 1024)
            print(f"on_train_epoch_end: resident size = {rss} MB")
        except Exception:
            pass

        if epoch_losses:
            avg = {k: float(np.mean([l[k] for l in epoch_losses])) for k in epoch_losses[0]}
            step = getattr(self, "_host_step", 0)
            self._log_scalars({"aloss": avg["loss"], "amel": avg["mel_loss"],
                               "apitch": avg["pitch_loss"], "aenergy": avg["energy_loss"],
                               "adur": avg["duration_loss"],
                               "lr": float(self.schedule(jnp.asarray(step)))}, step)
            print(f"epoch {epoch}: loss={avg['loss']:.4f} mel={avg['mel_loss']:.4f} "
                  f"({time.time() - t0:.1f}s)")

            every = max(1, self.tcfg.checkpoint_every_n_epochs)
            if epoch % every != every - 1 and epoch != self.tcfg.max_epochs - 1:
                return
            if self.tcfg.checkpoint_format == "orbax":
                from zerovox_tpu.training.checkpointing import save_orbax

                # orbax coordinates across processes itself; keep_checkpoints
                # pruning is orbax's max_to_keep
                save_orbax(os.path.join(ckpt_root, "orbax"), state, step=epoch,
                           keep=self.tcfg.keep_checkpoints)
            elif jax.process_index() == 0:
                path = os.path.join(ckpt_root, f"{epoch:04d}.msgpack")
                save_native_checkpoint(path, {"params": state.params,
                                              "batch_stats": state.batch_stats},
                                       meta={"epoch": epoch, "loss": avg["loss"],
                                             "step": step})
            if self.tcfg.keep_checkpoints > 0:
                ckpts = sorted(f for f in os.listdir(ckpt_root) if f.endswith(".msgpack"))
                for old in ckpts[: -self.tcfg.keep_checkpoints]:
                    os.remove(os.path.join(ckpt_root, old))
