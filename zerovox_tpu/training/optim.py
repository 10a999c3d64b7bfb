"""Optimizer + LR schedule.

Matches the reference training recipe (zerovox/tts/model.py:120-156, 542-589):
AdamW with configurable betas/eps/weight-decay, global-norm gradient clipping
(Lightning `gradient_clip_val`, utils/train_tts.py:305), and an
epoch-granularity linear-warmup + cosine-decay schedule whose decay factor is
floored at `min_lr` (0.1) — i.e. lr = base_lr * f(epoch) with
f = (e+1)/warmup during warmup, then max(0.1, 0.5*(1+cos(pi*progress))).

TPU note: the production configs all run betas=(0.0, 0.99). With b1=0 the
bias-corrected first moment is exactly the incoming gradient, so storing
`mu` is pure HBM traffic — the AdamW update is a bandwidth floor on the
step (docs/PERFORMANCE.md round-3 roofline: 6.8 GB streamed at 0.1% MFU).
`make_optimizer` therefore lowers the b1==0 case to a mu-free transform
with identical math (same bias correction, eps placement, and update
order as optax.adamw); the opt_state simply has no `mu` leaf tree.
(Orbax TrainState checkpoints written by the old mu-full layout fail
`--resume` with a clear structure-mismatch error — resave from msgpack
weights or set betas[0] to a nonzero epsilon to keep the old layout.)
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class ScaleByNuState(NamedTuple):
    """State for `_scale_by_adam_no_mu`: step count + second moment only."""

    count: chex.Array  # int32 scalar
    nu: optax.Updates


def _scale_by_adam_no_mu(b2: float, eps: float,
                         state_dtype=None) -> optax.GradientTransformation:
    """optax.scale_by_adam(b1=0, ...) without materializing mu.

    With b1=0, mu == g and the bias correction (1 - b1**t) == 1, so
    update = g / (sqrt(nu / (1 - b2**t)) + eps) — identical to
    optax.scale_by_adam's result, minus one params-sized read+write pair
    per step (and params-sized bytes of optimizer HBM).

    `state_dtype=jnp.bfloat16` stores nu in bf16 (another params-sized
    read+write pair halved; the AdamW update is a pure HBM-bandwidth floor,
    docs/PERFORMANCE.md roofline). The moment update itself always computes
    in f32; only the stored value is rounded. nu is a smooth EMA of g², so
    bf16's ~0.4% relative rounding enters the update through sqrt(nu) as
    ~0.2% step-size noise — unlike a bf16 FIRST moment, it does not bias
    the update direction. Opt-in (`zerovox-train --optim-dtype bf16`).
    """

    def init_fn(params):
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=state_dtype or p.dtype), params)
        return ScaleByNuState(count=jnp.zeros([], jnp.int32), nu=nu)

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_increment(state.count)
        nu32 = jax.tree.map(
            lambda n, g: b2 * n.astype(jnp.float32) + (1.0 - b2) * (g * g),
            state.nu, updates)
        bc = 1.0 - b2 ** count.astype(jnp.float32)
        updates = jax.tree.map(
            lambda g, n: g / (jnp.sqrt(n / bc) + eps), updates, nu32)
        nu = (nu32 if state_dtype is None else
              jax.tree.map(lambda n, s: n.astype(s.dtype), nu32, state.nu))
        return updates, ScaleByNuState(count=count, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def warmup_cosine_epoch_schedule(
    base_lr: float,
    warmup_epochs: int,
    total_epochs: int,
    steps_per_epoch: int,
    min_lr_factor: float = 0.1,
) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp

        epoch = step // max(steps_per_epoch, 1)
        warm = (epoch.astype(jnp.float32) + 1.0) / float(max(warmup_epochs, 1))
        progress = (epoch.astype(jnp.float32) - warmup_epochs) / float(
            max(1, total_epochs - warmup_epochs)
        )
        cos = jnp.maximum(min_lr_factor, 0.5 * (1.0 + jnp.cos(jnp.pi * progress)))
        f = jnp.where(epoch < warmup_epochs, warm, cos)
        return base_lr * f

    return schedule


def make_optimizer(
    learning_rate,
    weight_decay: float = 0.0,
    betas=(0.0, 0.99),
    eps: float = 1e-9,
    grad_clip: float = 1.0,
    state_dtype: str = "f32",
) -> optax.GradientTransformation:
    """`state_dtype`: 'f32' (default) or 'bf16' — storage dtype of the
    second moment in the mu-free path (see _scale_by_adam_no_mu). Ignored
    (with a warning) when betas[0] != 0 routes to stock optax.adamw."""
    sd = jnp.bfloat16 if state_dtype == "bf16" else None
    if betas[0] == 0.0:
        # mu-free lowering (exact same math; see module docstring). Mirrors
        # optax.adamw's transform order: scale_by_adam -> weight decay -> lr.
        return optax.chain(
            optax.clip_by_global_norm(grad_clip),
            _scale_by_adam_no_mu(b2=betas[1], eps=eps, state_dtype=sd),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_learning_rate(learning_rate),
        )
    if sd is not None:
        print("*** warning: --optim-dtype bf16 requires betas[0] == 0 "
              "(mu-free path); using full-precision optax.adamw")
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(
            learning_rate=learning_rate,
            b1=betas[0],
            b2=betas[1],
            eps=eps,
            weight_decay=weight_decay,
        ),
    )
