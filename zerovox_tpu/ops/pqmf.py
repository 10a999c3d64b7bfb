"""Pseudo-QMF multiband filter bank (synthesis path).

The reference's batch vocoding path supports legacy multi-band MelGAN
vocoders whose generator emits N subband signals that a PQMF synthesis filter
recombines into the full-band waveform (reference zerovox/tts/model.py:302-303
`meldec.pqmf.synthesis(wav)`). This is the standard near-perfect-
reconstruction cosine-modulated filter bank (Nguyen's prototype design with a
Kaiser window), implemented as an upsample + one im2col conv — MXU-friendly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from zerovox_tpu.models.layers import conv1d


def _design_prototype(taps: int, cutoff_ratio: float, beta: float) -> np.ndarray:
    """Kaiser-windowed sinc lowpass prototype h[n]."""
    n = np.arange(taps + 1)
    arg = cutoff_ratio * (n - 0.5 * taps)
    h_i = np.where(np.abs(arg) < 1e-9, cutoff_ratio, np.sin(np.pi * arg) / (np.pi * (n - 0.5 * taps + 1e-12)))
    # handle the center tap exactly
    if taps % 2 == 0:
        h_i[taps // 2] = cutoff_ratio
    w = np.kaiser(taps + 1, beta)
    return h_i * w


class PQMF:
    """N-band pseudo-QMF analysis/synthesis (defaults match the common
    multi-band MelGAN configuration: 4 bands, 62 taps, 0.142 cutoff, beta 9)."""

    def __init__(self, subbands: int = 4, taps: int = 62,
                 cutoff_ratio: float = 0.142, beta: float = 9.0):
        self.subbands = subbands
        h_proto = _design_prototype(taps, cutoff_ratio, beta)

        k = np.arange(subbands)[:, None]
        n = np.arange(taps + 1)[None, :]
        phase = (2 * k + 1) * np.pi / (2 * subbands) * (n - taps / 2)
        analysis = 2 * h_proto * np.cos(phase + (-1) ** k * np.pi / 4)
        synthesis = 2 * h_proto * np.cos(phase - (-1) ** k * np.pi / 4)

        # analysis: conv kernel [taps+1, 1, subbands]; synthesis: [taps+1, subbands, 1]
        self._analysis = jnp.asarray(analysis.T[:, None, :], dtype=jnp.float32)
        self._synthesis = jnp.asarray(synthesis.T[:, :, None], dtype=jnp.float32)
        self._taps = taps

    def analysis(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, T] -> [B, T//subbands, subbands]."""
        pad = self._taps // 2
        y = conv1d(x[..., None], self._analysis, stride=1, padding=pad)
        return y[:, :: self.subbands, :]

    def synthesis(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, T, subbands] (or torch-style [B, subbands, T]) -> [B, T*subbands]."""
        if x.shape[1] == self.subbands and x.shape[2] != self.subbands:
            x = jnp.transpose(x, (0, 2, 1))
        B, T, S = x.shape
        # zero-stuff upsample by S, scale by S, then synthesis filter
        up = jnp.zeros((B, T * S, S), x.dtype).at[:, ::S, :].set(x * S)
        pad = self._taps // 2
        y = conv1d(up, self._synthesis, stride=1, padding=pad)
        return y[..., 0]
