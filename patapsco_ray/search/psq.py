"""Probabilistic Structured Queries (PSQ) — cross-language retrieval
via translation tables.

Reference surface: PSQGenerator (topics.py:423-497) builds
``psq AND (t1^p1 t2^p2) AND (...)`` query strings from a normalized
translation table (util/formats.py:113-143); a custom Lucene searcher
scores them (retrieve.py:24-58). Scoring semantics (verified against
the reference's golden constants, tests/test_psq.py) are Darwish &
Oard's PSQ: per clause, projected tf/df feed the ordinary BM25 formula
— implemented in SegmentScorer.score_psq (engine.py).
"""

from __future__ import annotations

import json
import pathlib
import re

from ..text import TextProcessor

MAX_CLAUSES = 1023  # Lucene's 1024-clause cap minus the psq marker
# (reference topics.py:438-440)


def normalize_psq_entry(
    entry: dict[str, float], cum_thresh: float = 0.97,
    elem_thresh: float = 1e-5,
) -> dict[str, float]:
    """Renormalize one source term's translations and truncate at the
    cumulative-probability threshold (util/formats.py:113-130)."""
    total = sum(entry.values())
    entry = {w: p / total for w, p in entry.items()}
    entry = {w: p for w, p in entry.items() if p > elem_thresh}
    items = sorted(entry.items(), key=lambda kv: kv[1], reverse=True)
    if cum_thresh < 1 and items:
        cum = 0.0
        cut = len(items)
        for i, (_, p) in enumerate(items):
            cum += p
            if cum > cum_thresh:
                cut = i + 1
                break
        items = items[:cut]
        total = sum(p for _, p in items)
        items = [(w, p / total) for w, p in items]
    return dict(items)


def parse_psq_table(
    path: str | pathlib.Path, threshold: float = 0.97
) -> dict[str, dict[str, float]]:
    """Load a {source: {target: prob}} JSON table (util/formats.py:
    132-143; entries capped at 1024 translations before normalize)."""
    table = json.loads(pathlib.Path(path).read_text())
    out = {}
    for src, translations in table.items():
        items = list(translations.items())[:1024]
        out[src] = normalize_psq_entry(dict(items), cum_thresh=threshold)
    return out


_CLAUSE_RE = re.compile(r"\(([^()]*)\)")
_TERM_RE = re.compile(r"(\S+?)\^([0-9.eE+-]+)|(\S+)")


def parse_psq_query(query: str) -> list[list[tuple[str, float]]]:
    """Parse the reference's PSQ query syntax back into clauses
    (inverse of PSQGenerator.generate, topics.py:433-442)."""
    clauses = []
    for m in _CLAUSE_RE.finditer(query):
        clause = []
        for tm in _TERM_RE.finditer(m.group(1)):
            if tm.group(1) is not None:
                term = tm.group(1)
                prob = float(tm.group(2))
            else:
                term = tm.group(3)
                prob = 1.0
            term = term.replace("\\", "")
            if term:
                clause.append((term, prob))
        if clause:
            clauses.append(clause)
    return clauses


class PSQGenerator:
    """Query -> weighted translation clauses (topics.py:423-459).

    Chain per reference: tokenize the (pre-normalized) query,
    lowercase, project each token through the table (untranslated
    tokens pass through with prob 1.0), then per clause run the
    stopword-identify -> stem -> stopword-remove -> post_normalize
    steps on the TARGET-language tokens and drop emptied ones.
    """

    def __init__(self, processor: TextProcessor,
                 table: dict[str, dict[str, float]] | str | pathlib.Path,
                 threshold: float = 0.97):
        self.processor = processor
        self.table = (
            table if isinstance(table, dict)
            else parse_psq_table(table, threshold)
        )

    def generate(self, query_text: str) -> list[list[tuple[str, float]]]:
        norm = self.processor.pre_normalize(query_text)
        tokens = self.processor.tokenizer.tokenize(norm)
        if len(tokens) > MAX_CLAUSES:
            tokens = tokens[:MAX_CLAUSES]
        clauses = []
        for token in tokens:
            token = token.lower()
            if token in self.table:
                pairs = list(self.table[token].items())
            else:
                pairs = [(token, 1.0)]
            texts = [t for t, _ in pairs]
            proc = self.processor
            stop_idx = (
                proc.stopword_remover.identify(texts, is_lower=True)
                if proc.stopword_remover else []
            )
            if proc.stemmer:
                texts = proc.stemmer.stem(texts)
            kept = [
                (proc.normalizer.post_normalize(t), p)
                for i, (t, p) in enumerate(zip(texts, (p for _, p in pairs)))
                if i not in set(stop_idx)
            ]
            clause = [(t, p) for t, p in kept if t]
            if clause:
                clauses.append(clause)
        return clauses

    def to_query_string(self, clauses: list[list[tuple[str, float]]]) -> str:
        """Reference query-string form (topics.py:433-442)."""
        parts = [
            " ".join(f"{t}^{p:.4f}" for t, p in clause) for clause in clauses
        ]
        return "psq AND (" + ") AND (".join(parts) + ")"
