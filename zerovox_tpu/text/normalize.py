"""Text normalization: verbalize numbers/symbols, romanize, lowercase, strip.

Pipeline parity with the reference (zerovox/tts/normalize.py:28-47):

    normalize(text) -> (transcript_uroman, transcript_uroman_normalized)

where `transcript_uroman` is the verbalized + romanized + lowercased text
(still containing punctuation — the tokenizer extracts punctuation ids from
it) and `transcript_uroman_normalized` has everything outside [a-z' ]
replaced by spaces and whitespace collapsed (the alignment-target string).

The reference delegates verbalization to NeMo's WFST normalizer; when
`nemo_text_processing` is importable we do the same, otherwise a rule-based
normalizer covering cardinals, ordinals, decimals, currency, percent, time,
years and common abbreviations for en/de is used.
"""

from __future__ import annotations

import re

from zerovox_tpu.text import numbers_de, numbers_en
from zerovox_tpu.text.romanize import romanize

try:  # pragma: no cover - optional heavyweight dependency
    from nemo_text_processing.text_normalization.normalize import Normalizer as _NemoNormalizer
except Exception:  # pragma: no cover
    _NemoNormalizer = None


_ABBREV = {
    "en": {
        "mr": "mister", "mrs": "misses", "ms": "miss", "dr": "doctor",
        "prof": "professor", "st": "saint", "jr": "junior", "sr": "senior",
        "vs": "versus", "etc": "et cetera", "no": "number",
        "dept": "department", "approx": "approximately",
    },
    "de": {
        "dr": "doktor", "prof": "professor", "nr": "nummer",
        "str": "straße", "z.b": "zum beispiel", "bzw": "beziehungsweise",
        "usw": "und so weiter", "ca": "circa", "ggf": "gegebenenfalls",
        "evtl": "eventuell", "inkl": "inklusive",
    },
}

_CURRENCY = {
    "en": {"$": ("dollar", "dollars", "cent", "cents"),
           "€": ("euro", "euros", "cent", "cents"),
           "£": ("pound", "pounds", "penny", "pence")},
    "de": {"$": ("dollar", "dollar", "cent", "cent"),
           "€": ("euro", "euro", "cent", "cent"),
           "£": ("pfund", "pfund", "penny", "pence")},
}


class _RuleBasedVerbalizer:
    """Verbalize digits/symbols into words for one language."""

    def __init__(self, lang: str):
        self.lang = "de" if lang.startswith("de") else "en"
        self.num = numbers_de if self.lang == "de" else numbers_en

    # -- helpers -------------------------------------------------------------

    def _cardinal(self, s: str) -> str:
        return self.num.number_to_words(int(s))

    def _maybe_year(self, s: str) -> str:
        n = int(s)
        if 1100 <= n <= 2099:
            return self.num.year_to_words(n)
        return self.num.number_to_words(n)

    # -- main ----------------------------------------------------------------

    def verbalize(self, text: str) -> str:
        lang = self.lang
        num = self.num

        # common abbreviations (dot-terminated or bare word, case-insensitive)
        def abbrev_sub(m):
            key = m.group(1).lower()
            table = _ABBREV[lang]
            return table.get(key, m.group(0))

        abbrev_keys = "|".join(re.escape(k) for k in _ABBREV[lang])
        text = re.sub(rf"\b({abbrev_keys})\.(?=\s|$)", lambda m: abbrev_sub(m), text, flags=re.IGNORECASE)

        # currency: $12.50 / 12,50 € / €5
        def currency_sub(m):
            sym = m.group("sym")
            whole = m.group("whole").replace(",", "").replace(".", "") if lang == "de" else m.group("whole").replace(",", "")
            frac = m.group("frac")
            names = _CURRENCY[lang][sym]
            n = int(whole)
            out = num.number_to_words(n) + " " + (names[0] if n == 1 else names[1])
            if frac:
                c = int(frac)
                out += (" und " if lang == "de" else " ") + num.number_to_words(c) + " " + (names[2] if c == 1 else names[3])
            return out

        dec_sep = "," if lang == "de" else r"\."
        text = re.sub(
            rf"(?P<sym>[$€£])\s?(?P<whole>\d+)(?:{dec_sep}(?P<frac>\d{{2}}))?",
            currency_sub, text)
        text = re.sub(
            rf"(?P<whole>\d+)(?:{dec_sep}(?P<frac>\d{{2}}))?\s?(?P<sym>[$€£])",
            currency_sub, text)

        # percent
        pct_word = "prozent" if lang == "de" else "percent"
        text = re.sub(r"(\d+)\s?%", lambda m: self._cardinal(m.group(1)) + " " + pct_word, text)

        # time HH:MM
        def time_sub(m):
            h, mm = int(m.group(1)), int(m.group(2))
            if lang == "de":
                out = num.number_to_words(h) + " uhr"
                if mm:
                    out += " " + num.number_to_words(mm)
                return out
            out = num.number_to_words(h)
            if mm == 0:
                out += " o'clock"
            elif mm < 10:
                out += " oh " + num.number_to_words(mm)
            else:
                out += " " + num.number_to_words(mm)
            return out

        text = re.sub(r"\b(\d{1,2}):(\d{2})\b", time_sub, text)

        # ordinals: English 1st/2nd/..., German 3. (digit followed by period
        # then a lowercase word — heuristic to avoid sentence-final digits)
        if lang == "en":
            text = re.sub(r"\b(\d+)(st|nd|rd|th)\b", lambda m: num.ordinal_to_words(int(m.group(1))), text)
        else:
            text = re.sub(r"\b(\d+)\.(?=\s+\p{Ll})" if False else r"\b(\d+)\.(?=\s+[a-zäöüß])",
                          lambda m: num.ordinal_to_words(int(m.group(1))), text)

        # decimals
        if lang == "de":
            text = re.sub(r"\b(\d+),(\d+)\b", lambda m: num.decimal_to_words(m.group(1), m.group(2)), text)
        else:
            text = re.sub(r"\b(\d+)\.(\d+)\b", lambda m: num.decimal_to_words(m.group(1), m.group(2)), text)

        # thousands separators: 1,000,000 (en) / 1.000.000 (de)
        if lang == "en":
            text = re.sub(r"\b\d{1,3}(?:,\d{3})+\b", lambda m: num.number_to_words(int(m.group(0).replace(",", ""))), text)
        else:
            text = re.sub(r"\b\d{1,3}(?:\.\d{3})+\b", lambda m: num.number_to_words(int(m.group(0).replace(".", ""))), text)

        # remaining integers: 4-digit in year range read as years
        text = re.sub(r"\b\d{4}\b", lambda m: self._maybe_year(m.group(0)), text)
        text = re.sub(r"\b\d+\b", lambda m: self._cardinal(m.group(0)), text)

        # leftover symbols
        sym_words = {"&": " und " if lang == "de" else " and ",
                     "+": " plus ", "=": " gleich " if lang == "de" else " equals ",
                     "@": " at ", "/": " "}
        for sym, word in sym_words.items():
            text = text.replace(sym, word)

        return text


_normalizer_cache: dict[str, "_Backend"] = {}


class _Backend:
    def __init__(self, lang: str):
        self.lang = lang
        self.nemo = None
        if _NemoNormalizer is not None:  # pragma: no cover
            try:
                self.nemo = _NemoNormalizer(input_case="cased", lang=lang)
            except Exception:
                self.nemo = None
        self.rules = _RuleBasedVerbalizer(lang)

    def verbalize(self, text: str) -> str:
        if self.nemo is not None:  # pragma: no cover
            return self.nemo.normalize(text)
        return self.rules.verbalize(text)


def _get_backend(lang: str) -> _Backend:
    if lang not in _normalizer_cache:
        _normalizer_cache[lang] = _Backend(lang)
    return _normalizer_cache[lang]


def zerovox_normalize(transcript: str, lang: str) -> tuple[str, str]:
    """Normalize + romanize. Returns (uroman, uroman_normalized);
    semantics mirror reference zerovox/tts/normalize.py:28-47."""
    backend = _get_backend(lang)

    transcript_normalized = backend.verbalize(transcript)
    transcript_uroman = romanize(transcript_normalized).lower().strip()

    transcript_uroman_normalized = re.sub("([^a-z' ])", " ", transcript_uroman)
    transcript_uroman_normalized = re.sub(" +", " ", transcript_uroman_normalized)
    transcript_uroman_normalized = transcript_uroman_normalized.strip()

    return transcript_uroman, transcript_uroman_normalized


class ZeroVoxNormalizer:
    """Per-language normalizer facade (reference zerovox/tts/normalize.py:49-61)."""

    def __init__(self, lang: str):
        self._lang = lang

    @property
    def language(self) -> str:
        return self._lang

    def normalize(self, transcript: str) -> tuple[str, str]:
        return zerovox_normalize(transcript=transcript, lang=self._lang)
