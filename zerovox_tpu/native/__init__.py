"""Native (C++) runtime components, loaded via ctypes.

Built lazily with the system toolchain on first use; every native op has a
pure-Python fallback so the framework runs without a compiler too.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_HERE = Path(__file__).parent
_LIB_CACHE: dict[str, ctypes.CDLL | None] = {}


def _build(name: str) -> Path | None:
    src = _HERE / f"{name}.cpp"
    out = _HERE / f"lib{name}.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(src), "-o", str(out)],
            check=True, capture_output=True, timeout=120,
        )
        return out
    except Exception:
        return None


def load(name: str) -> ctypes.CDLL | None:
    """Load (building if needed) a native library; None when unavailable."""
    if name in _LIB_CACHE:
        return _LIB_CACHE[name]
    lib = None
    path = _build(name)
    if path is not None:
        try:
            lib = ctypes.CDLL(str(path))
        except OSError:
            lib = None
    _LIB_CACHE[name] = lib
    return lib
