"""Static-shape length regulation.

The reference expands each phoneme feature `duration[i]` times with a Python
loop over the batch and `torch.cat` of expanded views (reference
fs2.py:403-459) — data-dependent shapes, the central TPU design problem
(SURVEY.md §7.1). Here the same mapping is a fully vectorized gather into a
*fixed* `max_mel_len` frame grid:

    ends[i]   = cumsum(durations)[i]          (end frame of phone i)
    phone(t)  = #{i : ends[i] <= t}           (frame t -> source phone index)
    out[t]    = x[phone(t)]                   (gather)
    mask[t]   = t >= sum(durations)           (tail padding)

The frame->phone map is computed with a broadcast compare + integer reduce —
pure VPU work that XLA fuses with the gather; no scatter, no host sync, no
recompilation across utterances.
"""

from __future__ import annotations

import jax.numpy as jnp


def get_mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] bool mask, True at padded positions
    (reference fs2.py:565-573 convention)."""
    ids = jnp.arange(max_len)[None, :]
    return ids >= lengths[:, None]


def length_regulate(
    x: jnp.ndarray,
    durations: jnp.ndarray,
    max_mel_len: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Expand phone features by their durations into a fixed frame grid.

    Args:
      x:          [B, L, H] phone-level features.
      durations:  [B, L] int frame counts (>= 0); entries for padded phones
                  must be 0 (the variance adaptor masks them).
      max_mel_len: static output length T.

    Returns:
      (frames [B, T, H] with zeros past each item's mel_len,
       mel_len [B] int32 = clamped sum of durations,
       mel_mask [B, T] bool, True at padded frames).
    """
    durations = durations.astype(jnp.int32)
    ends = jnp.cumsum(durations, axis=1)  # [B, L]
    mel_len = jnp.minimum(ends[:, -1], max_mel_len)

    t = jnp.arange(max_mel_len, dtype=jnp.int32)  # [T]
    # phone index for each frame: count of phone-ends <= t
    idx = jnp.sum(
        (ends[:, None, :] <= t[None, :, None]).astype(jnp.int32), axis=-1
    )  # [B, T]
    idx = jnp.minimum(idx, x.shape[1] - 1)

    frames = jnp.take_along_axis(x, idx[..., None], axis=1)  # [B, T, H]
    mel_mask = get_mask_from_lengths(mel_len, max_mel_len)
    frames = jnp.where(mel_mask[..., None], 0.0, frames)
    return frames, mel_len, mel_mask
