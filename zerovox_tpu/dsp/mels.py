"""Log-mel spectrogram frontend, jitted for TPU.

Replaces the reference's CPU numpy/librosa pipeline
(reference zerovox/tts/mels.py:357-395) with a single jitted XLA program:
reflect-pad -> framed hann STFT (rfft) -> magnitude -> mel filterbank matmul
(MXU) -> log dynamic-range compression, plus the frame-energy (L2 norm of the
magnitude spectrum) the variance adaptor trains against.

The mel filterbank is the Slaney-scale, Slaney-normalized variant (librosa's
default), implemented from the textbook formula so numerical behavior matches
`librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax)` used by the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ----------------------------------------------------------------- filterbank


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(
    sampling_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float,
    fmax: float | None,
) -> np.ndarray:
    """Slaney-scale, area-normalized triangular mel filterbank [n_mels, 1+n_fft//2]."""
    if fmax is None:
        fmax = sampling_rate / 2.0

    fftfreqs = np.linspace(0.0, sampling_rate / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels + 2)
    mel_f = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney-style area normalization
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]

    return weights.astype(np.float32)


def hann_window(win_length: int) -> np.ndarray:
    """Periodic ("fftbins") hann window, as used by librosa/torch STFT."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


# ---------------------------------------------------------------------- STFT


def _frame(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Frame a 1-D signal [N] into [num_frames, frame_length] (center=False)."""
    num_frames = 1 + (x.shape[0] - frame_length) // hop
    starts = jnp.arange(num_frames) * hop
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return x[idx]


def stft_magnitudes(
    audio_padded: jnp.ndarray,
    n_fft: int,
    hop_size: int,
    window: jnp.ndarray,
) -> jnp.ndarray:
    """|STFT| of an already-padded signal. Returns [1+n_fft//2, num_frames]."""
    frames = _frame(audio_padded, n_fft, hop_size) * window[None, :]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.abs(spec).T.astype(jnp.float32)


def dynamic_range_compression(x: jnp.ndarray, C: float = 1.0, clip_val: float = 1e-5) -> jnp.ndarray:
    return jnp.log(jnp.clip(x, min=clip_val) * C)


class MelFrontend:
    """Jitted audio->(log-mel, energy) transform with static-length bucketing.

    Every distinct padded input length compiles one XLA program; callers that
    process arbitrary-length audio should use `__call__`, which pads the wav up
    to the next length bucket and slices the result, so the number of compiled
    programs stays bounded.
    """

    # wav-length buckets in seconds at 22.05 kHz: ~1s steps up to 24s
    _BUCKET_FRAMES = (87, 173, 345, 689, 1024, 1378, 1750, 2067)

    def __init__(
        self,
        sampling_rate: int = 22050,
        fft_size: int = 1024,
        hop_size: int = 256,
        win_length: int = 1024,
        num_mels: int = 80,
        fmin: float = 0,
        fmax: float | None = 8000,
    ):
        assert win_length <= fft_size
        self.sampling_rate = sampling_rate
        self.fft_size = fft_size
        self.hop_size = hop_size
        self.win_length = win_length
        self.num_mels = num_mels
        self.fmin = fmin
        self.fmax = fmax

        self._mel_basis = jnp.asarray(mel_filterbank(sampling_rate, fft_size, num_mels, fmin, fmax))
        win = hann_window(win_length)
        if win_length < fft_size:
            # center-pad the window to fft_size (librosa semantics)
            lpad = (fft_size - win_length) // 2
            win = np.pad(win, (lpad, fft_size - win_length - lpad))
        self._window = jnp.asarray(win)
        self._pad = (fft_size - hop_size) // 2

    # ------------------------------------------------------------- core jit

    @functools.partial(jax.jit, static_argnums=0)
    def _mel_energy(self, audio_padded: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        mags = stft_magnitudes(audio_padded, self.fft_size, self.hop_size, self._window)
        mel = dynamic_range_compression(self._mel_basis @ mags)
        energy = jnp.linalg.norm(mags, axis=0)
        return mel, energy

    # ---------------------------------------------------------------- public

    def num_frames(self, num_samples: int) -> int:
        """Frame count for an unpadded signal of `num_samples` samples."""
        padded = num_samples + 2 * self._pad
        return max(0, 1 + (padded - self.fft_size) // self.hop_size)

    def __call__(self, audio: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """audio [N] float32 in [-1,1] -> (mel [num_mels, T], energy [T]).

        Matches reference get_mel_from_wav (zerovox/tts/mels.py:357-395):
        reflect padding of (fft_size - hop_size)//2 on both sides, center=False
        STFT, log-clip mel, L2-norm energy.
        """
        audio = np.asarray(audio, dtype=np.float32)
        n_true = self.num_frames(len(audio))

        # bucket the frame count so jit compiles a bounded number of programs
        t_bucket = next((b for b in self._BUCKET_FRAMES if b >= n_true), None)
        if t_bucket is None:
            t_bucket = n_true
        # samples needed so that padded length yields exactly t_bucket frames
        n_samples = (t_bucket - 1) * self.hop_size + self.fft_size - 2 * self._pad
        tail = n_samples - len(audio)

        audio_padded = np.pad(audio, (self._pad, self._pad + max(0, tail)), mode="reflect")
        mel, energy = self._mel_energy(jnp.asarray(audio_padded))
        mel = np.asarray(mel)[:, :n_true]
        energy = np.asarray(energy)[:n_true]
        return mel, energy


_frontend_cache: dict[tuple, MelFrontend] = {}


def get_mel_from_wav(
    audio: np.ndarray,
    sampling_rate: int,
    fft_size: int,
    hop_size: int,
    win_length: int,
    num_mels: int,
    fmin: float,
    fmax: float | None,
) -> tuple[np.ndarray, np.ndarray]:
    """Drop-in replacement for the reference's get_mel_from_wav signature."""
    if np.min(audio) < -1.0:
        print(f"WARNING: get_mel_from_wav: audio min value < -1.0 : {np.min(audio)}")
    if np.max(audio) > 1.0:
        print(f"WARNING: get_mel_from_wav: audio max value >  1.0 : {np.max(audio)}")

    key = (sampling_rate, fft_size, hop_size, win_length, num_mels, fmin, fmax)
    fe = _frontend_cache.get(key)
    if fe is None:
        fe = MelFrontend(sampling_rate, fft_size, hop_size, win_length, num_mels, fmin, fmax)
        _frontend_cache[key] = fe
    return fe(audio)
