"""Chunked streaming vocoding.

New capability vs the reference (which vocodes whole utterances only,
model.py:337; SURVEY.md §7.4): the mel is split into fixed-size chunks, each
chunk is vocoded with a receptive-field *halo* of extra frames on both sides,
and the halo samples are trimmed from the waveform before yielding — so the
concatenated stream is sample-exact w.r.t. a full-utterance render (the
HiFi-GAN generator is purely convolutional, hence spatially local), and first
audio arrives after one small fixed-shape XLA program instead of the full
utterance.

Every chunk uses the same (chunk + 2*halo) frame shape, so the whole stream
runs a single cached compiled program regardless of utterance length.
"""

from __future__ import annotations

from typing import Iterator

import jax
import numpy as np


def stream_vocode(
    meldec,
    meldec_variables: dict,
    meldec_cfg,
    mel,  # [1, T_bucket, n_mels] (device array)
    mel_len: int,
    hop_length: int,
    chunk_frames: int = 96,
    halo_frames: int | None = None,
) -> Iterator[np.ndarray]:
    """Yield waveform chunks covering mel[:, :mel_len]."""
    if halo_frames is None:
        halo_frames = meldec_cfg.receptive_field_frames()

    up = meldec_cfg.total_upsample
    mel = np.asarray(mel)  # host copy once; chunks are sliced + re-uploaded
    n_mels = mel.shape[-1]

    jit_vocode = _get_jit(meldec)

    pos = 0
    while pos < mel_len:
        end = min(pos + chunk_frames, mel_len)

        lo = max(0, pos - halo_frames)
        hi = min(mel_len, end + halo_frames)

        # fixed-shape window: chunk + both halos, zero-padded at the borders
        win = np.zeros((1, chunk_frames + 2 * halo_frames, n_mels), dtype=np.float32)
        win_lo = halo_frames - (pos - lo)
        win[0, win_lo : win_lo + (hi - lo)] = mel[0, lo:hi]

        wav = jit_vocode(meldec_variables, win)
        wav.block_until_ready()

        start_s = halo_frames * up
        out = np.asarray(wav[0, start_s : start_s + (end - pos) * up])

        # borders: reproduce full-render zero padding semantics exactly —
        # interior chunks are exact because conv receptive field <= halo
        yield out
        pos = end


_jit_cache: dict = {}


def _get_jit(meldec):
    key = id(meldec)
    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(lambda v, m: meldec.apply(v, m))
    return _jit_cache[key]


def verify_stream_equivalence(meldec, meldec_variables, meldec_cfg, mel, mel_len, hop_length,
                              chunk_frames=64) -> float:
    """Max abs deviation between streamed and full-utterance waveforms
    (diagnostic; used by tests)."""
    jit_vocode = _get_jit(meldec)
    full = np.asarray(jit_vocode(meldec_variables, mel))[0, : mel_len * meldec_cfg.total_upsample]
    chunks = list(stream_vocode(meldec, meldec_variables, meldec_cfg, mel, mel_len,
                                hop_length, chunk_frames=chunk_frames))
    streamed = np.concatenate(chunks)
    n = min(len(full), len(streamed))
    return float(np.max(np.abs(full[:n] - streamed[:n])))
