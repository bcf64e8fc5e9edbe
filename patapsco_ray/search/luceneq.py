"""Minimal Lucene-syntax query support: boosts, +/- flags, AND/OR.

Reference surface: ``query.parse: true`` runs the query through
Lucene's QueryParser + a luqum AST transformer
(/root/reference/patapsco/topics.py:362-414); the default config is
parse=False (schema.py:124), so plain bag-of-words is the primary
path. This module covers the commonly used subset:

- ``term^2.5``  boost (weight multiplies the term's BM25 contribution,
  Lucene BoostQuery semantics)
- ``+term``     required (MUST)
- ``-term``     prohibited (MUST_NOT)
- ``a AND b``   both become required
- ``a OR b`` / plain juxtaposition — optional (SHOULD); Lucene's
  default operator is OR
- quoted phrases are NOT supported: the index is DOCS_AND_FREQS with
  no positions (reference index.py:52 — phrase queries are impossible
  there too); a phrase query returns empty results, matching the
  reference's failure behavior (retrieve.py:148-151)

Each term is processed through the same text chain as documents
(LuceneTransformer runs text processing per term node,
topics.py:393-414).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from ..text import TextProcessor


@dataclass(frozen=True)
class QueryTerm:
    term: str
    boost: float = 1.0
    required: bool = False
    prohibited: bool = False


_TOKEN_RE = re.compile(r'"[^"]*"|\S+')


def parse_lucene_query(text: str, processor: TextProcessor
                       ) -> list[QueryTerm] | None:
    """Parse the subset; None signals an unsupported query (phrases),
    which the caller maps to empty results."""
    raw_tokens = _TOKEN_RE.findall(text)
    terms: list[QueryTerm] = []
    pending_and = False
    for tok in raw_tokens:
        if tok.startswith('"'):
            return None  # phrases unsupported (no positions)
        if tok == "AND":
            pending_and = True
            # retroactively require the previous term (Lucene AND binds
            # both operands)
            if terms:
                prev = terms[-1]
                if not prev.prohibited:
                    terms[-1] = QueryTerm(prev.term, prev.boost, True, False)
            continue
        if tok in ("OR", "NOT"):
            if tok == "NOT":
                pending_and = "not"
            continue
        required = pending_and is True
        prohibited = pending_and == "not"
        pending_and = False
        if tok.startswith("+"):
            required, tok = True, tok[1:]
        elif tok.startswith("-"):
            prohibited, tok = True, tok[1:]
        boost = 1.0
        if "^" in tok:
            tok, _, b = tok.rpartition("^")
            try:
                boost = float(b)
            except ValueError:
                tok = f"{tok}^{b}"
        processed = processor.process(tok)
        if not processed:
            continue
        for t in processed.split():
            terms.append(QueryTerm(t, boost, required, prohibited))
    return terms


def search_lucene(searcher, query_text: str, k: int | None = None
                  ) -> list[dict]:
    """Boolean/boost search over an IndexSearcher. Scoring is the sum
    of boost x per-term BM25/QLD over SHOULD+MUST terms; MUST terms
    filter to docs containing all of them; MUST_NOT excludes."""
    from .engine import DEFAULT_K, lookup_global_stats

    k = k or DEFAULT_K
    parsed = parse_lucene_query(query_text, searcher.processor)
    if not parsed:  # unsupported or empty -> empty results
        return []
    scoring = [qt for qt in parsed if not qt.prohibited]
    required = [qt.term for qt in parsed if qt.required]
    prohibited = [qt.term for qt in parsed if qt.prohibited]
    all_terms = sorted({qt.term for qt in parsed})
    gstats = lookup_global_stats(searcher.index_dir, all_terms)
    if required and any(t not in gstats for t in required):
        return []  # a MUST term absent from the corpus matches nothing
    weights: dict[str, float] = {}
    for qt in scoring:
        weights[qt.term] = weights.get(qt.term, 0.0) + qt.boost

    def seg_fn(ss):
        from ..index.codec import decode_postings
        from ..index.segment import read_terms

        present = [t for t in all_terms if t in gstats]
        if not present:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float64))
        tbl = read_terms(searcher.index_dir, ss.seg_id, terms=present)
        rows = {r["term"]: r for r in tbl.to_pylist()}
        ords_sc, scores_sc = ss.score(weights, searcher.scorer, gstats,
                                      ss.ndocs, preloaded_rows=rows)
        if ords_sc.size == 0:
            return ords_sc, scores_sc
        keep = np.ones(ords_sc.size, dtype=bool)
        if required or prohibited:
            dense = np.zeros(ss.ndocs, dtype=np.int32)
            for t in required:
                row = rows.get(t)
                if row is None:
                    return (np.empty(0, dtype=np.int64),
                            np.empty(0, dtype=np.float64))
                o, _ = decode_postings(row["postings"], row["block_offsets"],
                                       row["block_counts"])
                dense[o] += 1
            keep &= dense[ords_sc] == len(required)
            if prohibited:
                bad = np.zeros(ss.ndocs, dtype=bool)
                for t in prohibited:
                    row = rows.get(t)
                    if row is not None:
                        o, _ = decode_postings(
                            row["postings"], row["block_offsets"],
                            row["block_counts"])
                        bad[o] = True
                keep &= ~bad[ords_sc]
        ords_sc, scores_sc = ords_sc[keep], scores_sc[keep]
        if ords_sc.size > k:
            order = np.lexsort((ords_sc, -scores_sc))[:k]
            ords_sc, scores_sc = ords_sc[order], scores_sc[order]
        return ords_sc, scores_sc

    return searcher._merge_segments(seg_fn, k)
