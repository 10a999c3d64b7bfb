"""Latin romanization of arbitrary text.

The reference pipes normalized text through the `uroman` package
(reference zerovox/tts/normalize.py:34). uroman is not available in this
environment, so this module provides a self-contained romanizer that matches
uroman's behavior on the languages the framework targets (en/de and other
Latin-script European text): NFKD decomposition with combining-mark removal,
plus explicit transliterations for letters that do not decompose (ß, æ, ø, þ,
đ, ł, ...) and for Greek/Cyrillic letters so mixed-script input degrades
gracefully. When the real `uroman` package is importable it is used instead.
"""

from __future__ import annotations

import functools
import unicodedata

try:  # pragma: no cover - optional dependency
    import uroman as _uroman_pkg

    _UROMAN = _uroman_pkg.Uroman()
except Exception:  # pragma: no cover
    _UROMAN = None

# letters that NFKD does not decompose
_SPECIAL = {
    "ß": "ss", "ẞ": "SS",
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O", "å": "a", "Å": "A",
    "ð": "d", "Ð": "D", "þ": "th", "Þ": "Th",
    "đ": "d", "Đ": "D", "ħ": "h", "Ħ": "H",
    "ł": "l", "Ł": "L", "ŋ": "ng", "Ŋ": "Ng",
    "ı": "i", "İ": "I", "ĸ": "k",
    "ŧ": "t", "Ŧ": "T", "ƒ": "f",
    "'": "'", "’": "'", "‘": "'", "ʼ": "'",
    "–": "-", "—": "-", "­": "",
}

_GREEK = {
    "α": "a", "β": "b", "γ": "g", "δ": "d", "ε": "e", "ζ": "z", "η": "e",
    "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m", "ν": "n", "ξ": "x",
    "ο": "o", "π": "p", "ρ": "r", "σ": "s", "ς": "s", "τ": "t", "υ": "y",
    "φ": "f", "χ": "ch", "ψ": "ps", "ω": "o",
}

_CYRILLIC = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e", "ё": "e",
    "ж": "zh", "з": "z", "и": "i", "й": "y", "к": "k", "л": "l", "м": "m",
    "н": "n", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u",
    "ф": "f", "х": "kh", "ц": "ts", "ч": "ch", "ш": "sh", "щ": "shch",
    "ъ": "", "ы": "y", "ь": "", "э": "e", "ю": "yu", "я": "ya",
}


def _translit_char(ch: str) -> str:
    if ch in _SPECIAL:
        return _SPECIAL[ch]
    low = ch.lower()
    if low in _GREEK:
        out = _GREEK[low]
        return out.upper() if ch.isupper() else out
    if low in _CYRILLIC:
        out = _CYRILLIC[low]
        return out.capitalize() if ch.isupper() else out
    # NFKD-decompose and drop combining marks
    decomp = unicodedata.normalize("NFKD", ch)
    stripped = "".join(c for c in decomp if not unicodedata.combining(c))
    return stripped


@functools.lru_cache(maxsize=4096)
def _translit_cached(ch: str) -> str:
    return _translit_char(ch)


def romanize(text: str) -> str:
    """Romanize `text` to Latin script. Uses uroman when installed."""
    if _UROMAN is not None:  # pragma: no cover - env without uroman
        return str(_UROMAN.romanize_string(text))
    return "".join(_translit_cached(ch) for ch in text)
