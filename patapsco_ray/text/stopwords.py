"""Stopword removal.

Mirrors the reference's two-phase StopWordsRemover (text.py:389-427):
``identify()`` runs BEFORE stemming (lowercasing each token unless the
stream is already lowercased), ``remove()`` drops by index AFTER
stemming (reference docs.py:253-256 ordering). The bundled word lists
are the public Apache Lucene analyzer stop lists (plus the Baidu zho
list) that the reference ships under resources/stopwords/.
"""

from __future__ import annotations

import pathlib

_RESOURCES = pathlib.Path(__file__).resolve().parent.parent / "resources" / "stopwords"


def load_stopwords(source: str, lang: str) -> frozenset[str]:
    """Load a stopword set; '#'-prefixed lines are comments
    (reference text.py:396-399)."""
    path = _RESOURCES / source / f"{lang}.txt"
    with open(path, encoding="utf8") as fp:
        return frozenset(
            w.strip() for w in fp if w.strip() and w[0] != "#"
        )


class StopWordsRemover:
    def __init__(self, source: str, lang: str):
        self.stop_words = load_stopwords(source, lang)

    def identify(self, tokens: list[str], is_lower: bool = False) -> list[int]:
        sw = self.stop_words
        if is_lower:
            return [i for i, t in enumerate(tokens) if t in sw]
        return [i for i, t in enumerate(tokens) if t.lower() in sw]

    def remove(self, tokens: list[str], indices: list[int]) -> list[str]:
        if not indices:
            return tokens
        drop = set(indices)
        return [t for i, t in enumerate(tokens) if i not in drop]
