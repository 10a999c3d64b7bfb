"""CTC forced alignment (Viterbi) + token-span merging.

Self-contained replacement for torchaudio's
``functional.forced_align`` / ``functional.merge_tokens`` used by the
reference preprocessor (utils/preprocess.py:421, 447). Given per-frame CTC
log-probabilities and a target token sequence, finds the maximum-probability
monotonic alignment over the standard CTC state graph (blank-interleaved
targets), returning a per-frame token id (blank where the path is in a blank
state) and the per-frame log-probability score; ``merge_tokens`` collapses
the framewise path into per-token spans.

The DP is vectorized over states in numpy (offline preprocessing is
host-side; T ~ 10^3, S ~ 10^3 → a few M ops per utterance); a jitted JAX
variant using ``lax.scan`` is provided for batch alignment on accelerators.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

NEG_INF = -1e30


@dataclass
class TokenSpan:
    """One aligned target token occupying frames [start, end)."""

    token: int
    start: int
    end: int
    score: float


def _native_forced_align(log_probs, targets, blank):
    """C++ fast path; returns None when the native lib is unavailable."""
    import ctypes

    from zerovox_tpu import native

    lib = native.load("ctc_align")
    if lib is None:
        return None

    log_probs = np.ascontiguousarray(log_probs, dtype=np.float32)
    targets = np.ascontiguousarray(np.asarray(targets, dtype=np.int64).reshape(-1))
    T, C = log_probs.shape
    out_tokens = np.empty(T, dtype=np.int64)
    out_scores = np.empty(T, dtype=np.float32)

    fn = lib.zv_forced_align
    fn.restype = ctypes.c_int
    rc = fn(
        log_probs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(T), ctypes.c_int64(C),
        targets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(targets)), ctypes.c_int64(blank),
        out_tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc == -1:
        raise ValueError(f"targets length {len(targets)} too long for {T} frames")
    return out_tokens, out_scores


def _extend_targets(targets: np.ndarray, blank: int) -> np.ndarray:
    """Interleave blanks: [t1, t2, ...] -> [b, t1, b, t2, ..., b]."""
    n = len(targets)
    ext = np.full(2 * n + 1, blank, dtype=np.int64)
    ext[1::2] = targets
    return ext


def forced_align(
    log_probs: np.ndarray,
    targets: np.ndarray,
    blank: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Viterbi CTC alignment. Dispatches to the native C++ DP
    (zerovox_tpu/native/ctc_align.cpp) when the toolchain built it, else the
    vectorized numpy fallback below — both produce identical paths.

    Args:
      log_probs: [T, C] log-probabilities (log_softmax over classes).
      targets:   [N] target token ids (no blanks).
      blank:     blank id.

    Returns:
      (aligned_tokens [T] int64 — target token id per frame, `blank` where
       the path sits in a blank state; scores [T] float — the emission
       log-probability of the aligned class at each frame).

    Raises ValueError when T < required minimum path length.
    """
    native = _native_forced_align(log_probs, targets, blank)
    if native is not None:
        return native

    log_probs = np.asarray(log_probs, dtype=np.float64)
    targets = np.asarray(targets, dtype=np.int64).reshape(-1)
    T, C = log_probs.shape
    ext = _extend_targets(targets, blank)
    S = len(ext)

    if len(targets) == 0:
        return np.full(T, blank, np.int64), log_probs[:, blank].astype(np.float32)
    # minimal frames: each target needs a frame, plus a frame between repeats
    min_frames = len(targets) + np.sum(targets[1:] == targets[:-1])
    if T < min_frames:
        raise ValueError(f"targets length {len(targets)} too long for {T} frames")

    # skip-transition allowed into state s when ext[s] != blank and != ext[s-2]
    can_skip = np.zeros(S, dtype=bool)
    can_skip[2:] = (ext[2:] != blank) & (ext[2:] != ext[:-2])

    alpha = np.full(S, NEG_INF)
    alpha[0] = log_probs[0, ext[0]]
    if S > 1:
        alpha[1] = log_probs[0, ext[1]]

    backptr = np.zeros((T, S), dtype=np.int8)  # 0: stay, 1: from s-1, 2: from s-2

    emit = log_probs[:, ext]  # [T, S]
    for t in range(1, T):
        stay = alpha
        prev1 = np.concatenate([[NEG_INF], alpha[:-1]])
        prev2 = np.concatenate([[NEG_INF, NEG_INF], alpha[:-2]])
        prev2 = np.where(can_skip, prev2, NEG_INF)

        stacked = np.stack([stay, prev1, prev2])  # [3, S]
        choice = np.argmax(stacked, axis=0)
        best = stacked[choice, np.arange(S)]
        backptr[t] = choice
        alpha = best + emit[t]

    # end state: last blank or last token
    s = S - 1 if alpha[S - 1] >= alpha[S - 2] else S - 2

    states = np.zeros(T, dtype=np.int64)
    for t in range(T - 1, -1, -1):
        states[t] = s
        s -= backptr[t, s]

    aligned = ext[states]
    scores = log_probs[np.arange(T), aligned]
    return aligned.astype(np.int64), scores.astype(np.float32)


def merge_tokens(aligned_tokens: np.ndarray, scores: np.ndarray, blank: int = 0) -> list[TokenSpan]:
    """Collapse a framewise alignment into per-token spans (consecutive equal
    non-blank frames merge; score = mean frame score over the span)."""
    spans: list[TokenSpan] = []
    T = len(aligned_tokens)
    t = 0
    while t < T:
        tok = int(aligned_tokens[t])
        if tok == blank:
            t += 1
            continue
        start = t
        while t < T and int(aligned_tokens[t]) == tok:
            t += 1
        spans.append(TokenSpan(token=tok, start=start, end=t,
                               score=float(np.mean(scores[start:t]))))
    return spans


# --------------------------------------------------------------- jax variant


def forced_align_jax(log_probs, targets, blank: int = 0):
    """Batched jittable Viterbi (lax.scan over frames). Shapes must be padded
    statically by the caller; returns (aligned_tokens, scores) like the numpy
    version. Useful when alignment runs on TPU next to the emission model."""
    import jax
    import jax.numpy as jnp

    targets = jnp.asarray(targets)
    n = targets.shape[0]
    ext = jnp.full((2 * n + 1,), blank, dtype=jnp.int32).at[1::2].set(targets)
    S = ext.shape[0]
    can_skip = jnp.concatenate([
        jnp.zeros(2, bool),
        (ext[2:] != blank) & (ext[2:] != ext[:-2]),
    ])

    emit = log_probs[:, ext]  # [T, S]
    alpha0 = jnp.full((S,), NEG_INF).at[0].set(emit[0, 0])
    alpha0 = alpha0.at[1].set(emit[0, 1]) if S > 1 else alpha0

    def step(alpha, e):
        stay = alpha
        prev1 = jnp.concatenate([jnp.array([NEG_INF]), alpha[:-1]])
        prev2 = jnp.concatenate([jnp.array([NEG_INF, NEG_INF]), alpha[:-2]])
        prev2 = jnp.where(can_skip, prev2, NEG_INF)
        stacked = jnp.stack([stay, prev1, prev2])
        choice = jnp.argmax(stacked, axis=0)
        best = jnp.take_along_axis(stacked, choice[None], axis=0)[0]
        return best + e, choice.astype(jnp.int8)

    alpha, backptrs = jax.lax.scan(step, alpha0, emit[1:])
    s_end = jnp.where(alpha[S - 1] >= alpha[S - 2], S - 1, S - 2)

    def back(s, bp):
        s_prev = s - bp[s].astype(jnp.int32)
        return s_prev, s_prev

    _, states_prev_rev = jax.lax.scan(back, s_end, backptrs[::-1])
    states = jnp.concatenate([states_prev_rev[::-1], jnp.array([s_end])])
    aligned = ext[states]
    scores = jnp.take_along_axis(log_probs, aligned[:, None], axis=1)[:, 0]
    return aligned, scores
