"""Griffin-Lim mel inversion sanity: a pure tone's mel, inverted, must
reconstruct a waveform whose dominant frequency matches the tone and whose
mel round-trip is close to the input."""

import numpy as np

from zerovox_tpu.dsp.griffinlim import GriffinLim
from zerovox_tpu.dsp.mels import get_mel_from_wav

SR = 22050


def test_tone_roundtrip():
    t = np.arange(int(1.0 * SR)) / SR
    wav = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    mel, _ = get_mel_from_wav(audio=wav, sampling_rate=SR, fft_size=1024,
                              hop_size=256, win_length=1024, num_mels=80,
                              fmin=0, fmax=8000)
    gl = GriffinLim(n_iter=24)
    rec = gl(mel.T)
    assert rec.dtype == np.float32
    assert np.abs(rec).max() <= 1.0

    # dominant frequency of the reconstruction ~ 440 Hz
    spec = np.abs(np.fft.rfft(rec[2048:-2048]))
    freqs = np.fft.rfftfreq(len(rec) - 4096, 1 / SR)
    f_peak = freqs[spec.argmax()]
    assert abs(f_peak - 440.0) < 15.0, f_peak

    # mel round-trip: re-analyze the reconstruction, compare log-mels over
    # the interior frames (edges differ from padding)
    mel2, _ = get_mel_from_wav(audio=rec[: len(wav)], sampling_rate=SR,
                               fft_size=1024, hop_size=256, win_length=1024,
                               num_mels=80, fmin=0, fmax=8000)
    T = min(mel.shape[1], mel2.shape[1]) - 8
    # compare mel *amplitudes* (log space magnifies inaudible leakage at
    # the -11.5 clip floor next to the tone); peak-norm scale cancels in
    # the cosine
    a = np.exp(mel[:, 4:T]).ravel()
    b = np.exp(mel2[:, 4:T]).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.95, cos
