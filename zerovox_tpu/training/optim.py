"""Optimizer + LR schedule.

Matches the reference training recipe (zerovox/tts/model.py:120-156, 542-589):
AdamW with configurable betas/eps/weight-decay, global-norm gradient clipping
(Lightning `gradient_clip_val`, utils/train_tts.py:305), and an
epoch-granularity linear-warmup + cosine-decay schedule whose decay factor is
floored at `min_lr` (0.1) — i.e. lr = base_lr * f(epoch) with
f = (e+1)/warmup during warmup, then max(0.1, 0.5*(1+cos(pi*progress))).
"""

from __future__ import annotations

import optax


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
) -> optax.GradientTransformation:
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
