"""Chunked streaming vocoding.

New capability vs the reference (which vocodes whole utterances only,
model.py:337; SURVEY.md §7.4): the mel is split into fixed-size chunks, each
vocoded with a receptive-field *halo* of extra frames on both sides, and the
halo samples are trimmed before yielding — so the concatenated stream is
sample-exact w.r.t. a full-utterance render (the HiFi-GAN generator is purely
convolutional, hence spatially local), and first audio arrives after one
small fixed-shape XLA program instead of the full utterance.

Every chunk runs the same (chunk + 2*halo)-frame program, and the chunk
window is sliced out of the decoder's mel *on device* with a dynamic slice —
the mel never round-trips to the host, only the audio chunks come back.
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _window_vocoder(meldec, window_frames: int):
    """Jitted (mel_padded, start) -> wav program for one window size."""

    @functools.partial(jax.jit, static_argnames=())
    def run(variables, mel_padded, start):
        win = jax.lax.dynamic_slice(
            mel_padded,
            (0, start, 0),
            (1, window_frames, mel_padded.shape[2]),
        )
        return meldec.apply(variables, win)

    return run


def stream_vocode(
    meldec,
    meldec_variables: dict,
    meldec_cfg,
    mel,  # [1, T_bucket, n_mels] device array; zeros past mel_len
    mel_len: int,
    hop_length: int,
    chunk_frames: int = 96,
    halo_frames: int | None = None,
) -> Iterator[np.ndarray]:
    """Yield waveform chunks covering mel[:, :mel_len]."""
    if halo_frames is None:
        halo_frames = meldec_cfg.receptive_field_frames()

    up = meldec_cfg.total_upsample
    window = chunk_frames + 2 * halo_frames

    # left halo zeros + right padding so any window start is in range;
    # frames past mel_len are already zero (decoder mask)
    mel_padded = jnp.pad(jnp.asarray(mel), ((0, 0), (halo_frames, window), (0, 0)))
    run = _window_vocoder(meldec, window)

    pos = 0
    while pos < mel_len:
        end = min(pos + chunk_frames, mel_len)
        # window starts at (pos - halo) in mel coords = pos in padded coords
        wav = run(meldec_variables, mel_padded, pos)
        start_s = halo_frames * up
        out = np.asarray(wav[0, start_s : start_s + (end - pos) * up])
        yield out
        pos = end


def verify_stream_equivalence(meldec, meldec_variables, meldec_cfg, mel, mel_len,
                              hop_length, chunk_frames=64) -> float:
    """Max abs deviation between streamed and full-utterance waveforms
    (diagnostic; used by tests)."""
    full_fn = jax.jit(lambda v, m: meldec.apply(v, m))
    full = np.asarray(full_fn(meldec_variables, mel))[0, : mel_len * meldec_cfg.total_upsample]
    chunks = list(stream_vocode(meldec, meldec_variables, meldec_cfg, mel, mel_len,
                                hop_length, chunk_frames=chunk_frames))
    streamed = np.concatenate(chunks)
    n = min(len(full), len(streamed))
    return float(np.max(np.abs(full[:n] - streamed[:n])))
