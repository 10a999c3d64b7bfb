"""Chunked streaming vocoding.

New capability vs the reference (which vocodes whole utterances only,
model.py:337; SURVEY.md §7.4): the mel is split into fixed-size chunks, each
vocoded with a receptive-field *halo* of extra frames on both sides, and the
halo samples are trimmed before yielding — so the concatenated stream is
sample-exact w.r.t. a full-utterance render (the HiFi-GAN generator is purely
convolutional, hence spatially local), and first audio arrives after one
small fixed-shape XLA program instead of the full utterance.

Boundary subtlety: halo-and-trim is exact only where the halo holds REAL
mel context. At the utterance start there is none, and a zero halo is NOT
equivalent — conv biases make intermediate activations nonzero over an
explicit zero prefix, while the full render's per-layer implicit padding
stays zero at every depth, so prepend-and-trim drifts over the first
~receptive-field frames. The first window therefore starts at mel[0] with
no left halo (see ChunkStreamer.dispatch). The symmetric right-edge case
is benign in practice: past mel_len both paths see the same explicit
zeros (the decoder masks the bucket tail), so they only diverge when
mel_len reaches within one receptive field of the BUCKET end — there the
full render's implicit edge shows through; the error is confined to the
final ~RF output frames of a bucket-full utterance.

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
def _window_vocoder(meldec, window_frames: int, wire_i16: bool = False):
    """Jitted (mel_padded, start) -> wav program for one window size.
    With wire_i16 the int16 conversion is fused into the same program so the
    per-chunk device->host fetch moves half the bytes (tunneled backends)."""

    @functools.partial(jax.jit, static_argnames=())
    def run(variables, mel_padded, start):
        win = jax.lax.dynamic_slice(
            mel_padded,
            (0, start, 0),
            (1, window_frames, mel_padded.shape[2]),
        )
        wav = meldec.apply(variables, win)
        if wire_i16:
            wav = jnp.clip(wav * 32760.0, -32768.0, 32767.0).astype(jnp.int16)
        return wav

    return run


class ChunkStreamer:
    """Fixed-window chunked vocoder over one decoded mel."""

    def __init__(self, meldec, meldec_variables, meldec_cfg, mel,
                 chunk_frames: int = 96, halo_frames: int | None = None,
                 wire_i16: bool = False):
        if halo_frames is None:
            halo_frames = meldec_cfg.receptive_field_frames()
        self.halo = halo_frames
        self.up = meldec_cfg.total_upsample
        self.chunk = chunk_frames
        self.window = chunk_frames + 2 * halo_frames
        self._vars = meldec_variables
        self._wire_i16 = wire_i16
        # left halo zeros + right padding so any window start is in range;
        # frames past mel_len are already zero (decoder mask)
        self._mel_padded = jnp.pad(jnp.asarray(mel),
                                   ((0, 0), (self.halo, self.window), (0, 0)))
        self._run = _window_vocoder(meldec, self.window, wire_i16)

    def dispatch(self, pos: int):
        """Asynchronously start vocoding the window for the chunk starting
        at mel position `pos`, and start its device->host copy as soon as
        the program completes — on tunneled backends the copy (~33 ms RTT)
        then overlaps whatever the host does next (the duration sync, the
        previous chunk's yield) instead of serializing behind it.

        pos == 0 (utterance start) anchors the window AT mel[0] with no
        left halo: a zero halo is NOT equivalent to the full render there.
        Each conv layer's implicit padding is zero at every depth, but an
        explicit zero-prepended input develops nonzero activations in the
        halo (conv biases, leaky-relu of them) that deeper layers read —
        so prepend-and-trim diverges from the full render over the first
        ~receptive-field frames (caught by the styletts streaming test,
        whose mel is loud at frame 0; fs2's near-silent opening frames hid
        it). Starting window 0 at mel[0] reproduces the full render's
        implicit left edge exactly; trim() then trims nothing on the left."""
        start = self.halo if pos == 0 else pos
        out = self._run(self._vars, self._mel_padded, start)
        try:
            out.copy_to_host_async()
        except Exception:
            pass  # backend without async host copies
        return out

    def trim(self, wav, n_frames: int, pos: int = None) -> np.ndarray:
        """`pos` is the chunk's mel position (see dispatch: the utterance-
        start window carries no left halo). Defaults to an interior chunk."""
        start_s = 0 if pos == 0 else self.halo * self.up
        out = np.asarray(wav)[0, start_s : start_s + n_frames * self.up]
        if self._wire_i16:
            out = out.astype(np.float32) / 32760.0
        return out

    def chunks(self, mel_len: int, pos: int = 0, first_wav=None) -> Iterator[np.ndarray]:
        """Yield chunks covering mel[pos:mel_len]; `first_wav` is an already-
        dispatched window at `pos` (speculative pipelining). The next window
        is always dispatched before the current one is fetched, so device
        compute overlaps the host-side fetch/yield of the previous chunk."""
        pending_pos = pos
        pending = first_wav if first_wav is not None else self.dispatch(pos)
        while pending_pos < mel_len:
            end = min(pending_pos + self.chunk, mel_len)
            nxt = self.dispatch(end) if end < mel_len else None
            yield self.trim(pending, end - pending_pos, pos=pending_pos)
            pending, pending_pos = nxt, end


def stream_vocode(
    meldec,
    meldec_variables: dict,
    meldec_cfg,
    mel,  # [1, T_bucket, n_mels] device array; zeros past mel_len
    mel_len: int,
    hop_length: int,
    chunk_frames: int = 96,
    halo_frames: int | None = None,
    wire_i16: bool = False,
) -> Iterator[np.ndarray]:
    """Yield waveform chunks covering mel[:, :mel_len]."""
    streamer = ChunkStreamer(meldec, meldec_variables, meldec_cfg, mel,
                             chunk_frames, halo_frames, wire_i16=wire_i16)
    yield from streamer.chunks(mel_len)


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
