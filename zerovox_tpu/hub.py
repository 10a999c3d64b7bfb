"""Model distribution: HuggingFace download + local cache.

Contract parity with the reference (zerovox/tts/model.py:66-82): artifacts
resolve from `https://huggingface.co/goooofy/{model}/resolve/main/{relpath}`,
cached under `~/.cache/zerovox` (env override `CACHED_PATH_ZEROVOX`). Uses
urllib so there is no torch.hub dependency; zero-egress environments simply
get a clear error if the artifact is not already cached.
"""

from __future__ import annotations

import os
import urllib.request
from pathlib import Path

DEFAULT_MELDEC_MODEL_NAME = "zerovox-hifigan-vctk-v2-en-1"
DEFAULT_TTS_MODEL_NAME_EN = "tts_en_zerovox2_medium_2_styledec"
DEFAULT_TTS_MODEL_NAME_DE = "tts_de_zerovox2_medium_3_styledec"


def cache_path() -> Path:
    return Path(os.getenv("CACHED_PATH_ZEROVOX", Path.home() / ".cache" / "zerovox"))


def get_default_model(lang: str) -> str:
    """(reference zerovox/tts/synthesize.py:40-46)."""
    if lang == "de":
        return os.getenv("ZEROVOX_TTS_MODEL_DE", DEFAULT_TTS_MODEL_NAME_DE)
    return os.getenv("ZEROVOX_TTS_MODEL_EN", DEFAULT_TTS_MODEL_NAME_EN)


def download_model_file(model: str, relpath: str) -> Path:
    """Resolve (and download if needed) one artifact of a hub model."""
    target_dir = cache_path() / "model_repo" / model
    target_path = target_dir / relpath

    if target_path.exists():
        return target_path

    os.makedirs(target_dir, exist_ok=True)
    url = f"https://huggingface.co/goooofy/{model}/resolve/main/{relpath}?download=true"
    try:
        tmp = str(target_path) + ".part"
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, target_path)
    except Exception as e:  # pragma: no cover - network-dependent
        raise RuntimeError(
            f"could not download {url} and it is not cached at {target_path}; "
            f"pre-populate the cache (CACHED_PATH_ZEROVOX) in offline environments"
        ) from e
    return target_path
