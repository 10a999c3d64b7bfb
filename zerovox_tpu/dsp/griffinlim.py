"""Griffin-Lim mel inversion (jitted).

Audible mel rendering without a trained neural vocoder: log-mel ->
approximate linear magnitudes (transpose-normalized filterbank inverse) ->
iterative Griffin-Lim phase recovery, all under one jit (the iteration is a
lax.fori_loop; overlap-add is a scatter-add, which XLA lowers well for the
sorted frame indices used here).

The reference has no equivalent (its only mel->wav path is the externally
trained HiFi-GAN "meldec", zerovox/tts/model.py:86-118); this exists so
training experiments can produce listenable output in environments where no
trained vocoder checkpoint is available (e.g. scripts/exp_real_speech.py),
and as a debugging tool for mel-space regressions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zerovox_tpu.dsp.mels import _frame, hann_window, mel_filterbank


class GriffinLim:
    """mel [T, n_mels] (log-compressed, as the model emits) -> wav [N]."""

    def __init__(self, sampling_rate: int = 22050, fft_size: int = 1024,
                 hop_size: int = 256, win_length: int = 1024,
                 num_mels: int = 80, fmin: float = 0,
                 fmax: float | None = 8000, n_iter: int = 32,
                 power: float = 1.0):
        self.fft_size = fft_size
        self.hop_size = hop_size
        self.n_iter = n_iter
        self.power = power

        fb = mel_filterbank(sampling_rate, fft_size, num_mels, fmin, fmax)
        # transpose inverse with column normalization: each fft bin's mel
        # weights sum to ~1 so magnitudes land at the right scale
        col = fb.sum(axis=0, keepdims=True)
        self._fb_inv = jnp.asarray((fb / np.maximum(col, 1e-8)).T)

        win = hann_window(win_length)
        if win_length < fft_size:
            lpad = (fft_size - win_length) // 2
            win = np.pad(win, (lpad, fft_size - win_length - lpad))
        self._window = jnp.asarray(win)

    @functools.partial(jax.jit, static_argnums=0)
    def _invert(self, mel: jnp.ndarray) -> jnp.ndarray:
        # [T, n_mels] log-mel -> linear magnitudes [T, bins]
        mag = jnp.exp(mel) @ self._fb_inv.T
        # mild spectral sharpening counteracts the mel smear
        mag = jnp.maximum(mag, 0.0) ** self.power

        T = mag.shape[0]
        n = (T - 1) * self.hop_size + self.fft_size
        starts = jnp.arange(T) * self.hop_size
        idx = starts[:, None] + jnp.arange(self.fft_size)[None, :]
        win = self._window
        wsum = jnp.zeros(n).at[idx.reshape(-1)].add(
            jnp.tile(win**2, (T,)))
        wsum = jnp.maximum(wsum, 1e-8)

        def istft(spec):
            frames = jnp.fft.irfft(spec, n=self.fft_size, axis=-1) * win[None]
            y = jnp.zeros(n).at[idx.reshape(-1)].add(frames.reshape(-1))
            return y / wsum

        def stft(y):
            return jnp.fft.rfft(_frame(y, self.fft_size, self.hop_size)
                                * win[None], n=self.fft_size, axis=-1)

        # zero-phase init, then alternate projections
        spec = mag.astype(jnp.complex64)

        def body(_, spec):
            y = istft(spec)
            s = stft(y)
            phase = s / jnp.maximum(jnp.abs(s), 1e-8)
            return mag * phase

        spec = jax.lax.fori_loop(0, self.n_iter, body, spec)
        y = istft(spec)
        peak = jnp.maximum(jnp.max(jnp.abs(y)), 1e-8)
        return (y / peak * 0.9).astype(jnp.float32)

    def __call__(self, mel: np.ndarray) -> np.ndarray:
        """mel [T, n_mels] log-mel -> wav float32 (peak-normalized)."""
        return np.asarray(self._invert(jnp.asarray(mel, jnp.float32)))
