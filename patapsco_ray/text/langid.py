"""ISO 639 language-code standardization.

The reference standardizes codes with pycountry
(/root/reference/patapsco/util/__init__.py:322-356: accepts 2- or
3-letter codes, normalizes to ISO 639-3, with zho/eng-style aliases).
pycountry is not available here, so this is a static map covering the
reference's supported languages (its stopword/stemmer matrix) plus
common web-corpus languages.
"""

from __future__ import annotations

# ISO 639-1 -> 639-3 for the languages the reference handles plus
# frequent Common-Crawl languages
_TWO_TO_THREE = {
    "ar": "ara", "de": "deu", "en": "eng", "es": "spa", "fa": "fas",
    "fr": "fra", "he": "heb", "id": "ind", "it": "ita", "ja": "jpn",
    "ko": "kor", "nl": "nld", "pl": "pol", "pt": "por", "ru": "rus",
    "tr": "tur", "vi": "vie", "zh": "zho",
}
_THREE = set(_TWO_TO_THREE.values())
_ALIASES = {
    "chi": "zho", "ger": "deu", "fre": "fra", "per": "fas", "dut": "nld",
}


def standardize_lang(code: str) -> str:
    """Normalize a 2/3-letter code to ISO 639-3; raises on unknown
    (reference LangStandardizer errors on unsupported codes)."""
    c = code.strip().lower()
    if c in _TWO_TO_THREE:
        return _TWO_TO_THREE[c]
    if c in _THREE:
        return c
    if c in _ALIASES:
        return _ALIASES[c]
    raise ValueError(f"unknown language code: {code!r}")


def lang_to_two(code: str) -> str:
    """ISO 639-3 -> 639-1 where one exists."""
    three = standardize_lang(code)
    for two, th in _TWO_TO_THREE.items():
        if th == three:
            return two
    raise ValueError(f"no 2-letter code for {code!r}")
