"""Import helper for the reference PyTorch implementation at /root/reference.

Used only by parity tests: we load the reference's torch modules, run them on
CPU, and check our JAX reimplementation + weight importer reproduce their
outputs (BASELINE.md: within 1e-2; in practice f32 round-off ~1e-5).

torchaudio is absent in this environment; the reference's ResNetSE34V2
constructs (but never calls) a torchaudio MelSpectrogram, so a stub module is
installed before import.
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def _stub_torchaudio():
    if "torchaudio" in sys.modules:
        return
    import torch

    import importlib.machinery

    ta = types.ModuleType("torchaudio")
    tat = types.ModuleType("torchaudio.transforms")
    # transformers probes importlib.util.find_spec("torchaudio"), which
    # raises if a stub module has __spec__ = None
    ta.__spec__ = importlib.machinery.ModuleSpec("torchaudio", None)
    tat.__spec__ = importlib.machinery.ModuleSpec("torchaudio.transforms", None)

    class _FakeMelSpectrogram(torch.nn.Module):
        def __init__(self, **kwargs):
            super().__init__()

        def forward(self, x):  # pragma: no cover - never called by the model
            return x

    tat.MelSpectrogram = _FakeMelSpectrogram
    ta.transforms = tat
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.transforms"] = tat


def load_reference():
    """Returns the reference's fs2, styletts, ResNetSE34V2, hifigan modules."""
    _stub_torchaudio()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from zerovox.tts import ResNetSE34V2 as resnet_mod
    from zerovox.tts import fs2 as fs2_mod
    from zerovox.tts import hifigan as hifigan_mod
    from zerovox.tts import styletts as styletts_mod

    return fs2_mod, styletts_mod, resnet_mod, hifigan_mod


def _stub_lightning():
    """lightning isn't installed; the reference ZeroVox only needs
    LightningModule to behave like nn.Module for forward/inference parity."""
    if "lightning" in sys.modules:
        return
    import torch

    lightning = types.ModuleType("lightning")

    class LightningModule(torch.nn.Module):
        def save_hyperparameters(self, *args, **kwargs):
            pass

    lightning.LightningModule = LightningModule
    sys.modules["lightning"] = lightning


def load_reference_model_module():
    """Import the reference's full composite model (zerovox/tts/model.py)
    with lightning stubbed."""
    _stub_torchaudio()
    _stub_lightning()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from zerovox.tts import model as model_mod

    return model_mod
