"""Built-in CTC alignment acoustic model, trained in-repo.

The reference's forced alignment uses torchaudio's pretrained MMS_FA wav2vec2
CTC bundle (utils/preprocess.py:333-342). This zero-egress build cannot
download those weights, so it ships a small JAX CTC model instead, trained
(scripts/train_tone_ctc.py, optax.ctc_loss) on the deterministic tone-speak
voice (zerovox_tpu/utils/synthvoice.py) where every character has a known
acoustic signature and exact ground-truth boundaries.

This gives the framework a *verified phonetic* alignment path: alignments are
derived from per-frame acoustic identity (which tone is sounding), not from
an energy ramp — tests assert recovered character boundaries match the
synthesizer's ground truth. For real speech corpora, point --aligner at any
HF wav2vec2-CTC checkpoint (preprocess/aligner.py Wav2Vec2Aligner); the
emission/alignment contract (16 kHz, hop 320, blank 0) is identical.
"""

from __future__ import annotations

import os

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from zerovox_tpu.dsp.mels import MelFrontend
from zerovox_tpu.models.layers import Conv1d
from zerovox_tpu.preprocess.aligner import DEFAULT_LABELS, AlignerBase

WEIGHTS_FILE = os.path.join(os.path.dirname(__file__), "tone_ctc_weights.npz")

SAMPLE_RATE = 16000
HOP = 320
NUM_MELS = 40


class ToneCTCNet(nn.Module):
    """mel [B, T, M] -> per-frame CTC logits [B, T, C]."""

    num_classes: int = len(DEFAULT_LABELS)
    hidden: int = 96

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv1d(self.hidden, kernel_size=5, padding=2)(x)
        x = nn.relu(x)
        x = Conv1d(self.hidden, kernel_size=5, padding=2)(x)
        x = nn.relu(x)
        return nn.Dense(self.num_classes)(x)


def make_frontend() -> MelFrontend:
    """16 kHz log-mel at the MMS_FA frame rate (hop 320 -> 50 fps)."""
    return MelFrontend(sampling_rate=SAMPLE_RATE, fft_size=512, hop_size=HOP,
                       win_length=400, num_mels=NUM_MELS, fmin=0, fmax=8000)


def extract_features(frontend: MelFrontend, wav: np.ndarray, hop: int = HOP) -> np.ndarray:
    """Per-utterance mean/var-normalized log-mel [T, M], T = len(wav)//hop."""
    mel, _ = frontend(np.asarray(wav, np.float32))
    mel = mel.T[: len(wav) // hop]
    return (mel - mel.mean()) / (mel.std() + 1e-5)


def save_params(params, path=WEIGHTS_FILE) -> None:
    from flax.traverse_util import flatten_dict

    flat = {"/".join(k): np.asarray(v)
            for k, v in flatten_dict(params).items()}
    np.savez(path, **flat)


def load_params(path=WEIGHTS_FILE):
    from flax.traverse_util import unflatten_dict

    with np.load(path) as z:
        flat = {tuple(k.split("/")): z[k] for k in z.files}
    return unflatten_dict(flat)


class ToneCTCAligner(AlignerBase):
    """Emissions from the bundled tone-speak CTC model (16 kHz, hop 320)."""

    sample_rate = SAMPLE_RATE
    hop_size = HOP

    def __init__(self, weights_path: str = WEIGHTS_FILE):
        super().__init__(DEFAULT_LABELS)
        if not os.path.exists(weights_path):
            raise FileNotFoundError(
                f"tone CTC weights not found at {weights_path}; run "
                f"scripts/train_tone_ctc.py to (re)create them")
        self._params = load_params(weights_path)
        self._net = ToneCTCNet()
        self._frontend = make_frontend()
        self._apply = jax.jit(
            lambda p, mel: jax.nn.log_softmax(
                self._net.apply({"params": p}, mel), axis=-1))

    def features(self, wav: np.ndarray) -> np.ndarray:
        """wav [n] -> log-mel [T, M] at the emission frame rate (T=n//hop)."""
        return extract_features(self._frontend, wav, self.hop_size)

    def emissions(self, wav_batch: np.ndarray) -> np.ndarray:
        B, n = wav_batch.shape
        T = n // self.hop_size
        mels = np.stack([
            np.pad(self.features(w), ((0, T), (0, 0)))[:T] for w in wav_batch])
        out = self._apply(self._params, jnp.asarray(mels))
        return np.asarray(out)
