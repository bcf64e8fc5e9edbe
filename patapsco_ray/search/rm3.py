"""RM3 pseudo-relevance feedback.

Reference surface: ``retrieve.rm3: true`` switches pyserini's Lucene
Rm3Reranker on with fb_terms=10, fb_docs=10,
original_query_weight=0.5 (reference retrieve.py:104-113,
schema.py:176-180; incompatible with PSQ, retrieve.py:105-106).

This is the standard RM3 algorithm (Abdul-Jaleel et al., UMass TREC
2004; the published algorithm pyserini implements): build a relevance
model from the top fb_docs' term distributions weighted by their
retrieval scores, keep fb_terms terms, interpolate with the original
query model. The reference runs it inside Lucene on stored term
vectors (index.py:51); here the feedback docs' term vectors come from
the processed-text doc store. Exact Lucene score parity is not claimed
(SURVEY.md §7.4 item 7) — rankings follow the published model.
"""

from __future__ import annotations

import collections

from ..stages.docstore import DocStore
from .engine import IndexSearcher, process_query

FB_TERMS = 10          # reference schema.py:176-179
FB_DOCS = 10
ORIGINAL_QUERY_WEIGHT = 0.5


def rm3_expand(
    searcher: IndexSearcher,
    store: DocStore,
    query_text: str,
    *,
    fb_terms: int = FB_TERMS,
    fb_docs: int = FB_DOCS,
    original_query_weight: float = ORIGINAL_QUERY_WEIGHT,
) -> dict[str, float]:
    """Return the interpolated query model as term -> weight."""
    terms = process_query(query_text, searcher.processor)
    if not terms:
        return {}
    counts = collections.Counter(terms)
    total_q = sum(counts.values())
    orig = {t: c / total_q for t, c in counts.items()}

    hits = searcher.search_weighted(dict(counts), k=fb_docs)
    if not hits:
        return orig
    fetched = store.lookup([h["doc_id"] for h in hits])
    # the store records its text column in _store_meta.json; fall back
    # to "text" (the runner's processed-docs layout) when reading a
    # store written before that field existed
    text_col = getattr(store, "text_column", "text")
    if text_col not in fetched.schema.names:
        raise ValueError(
            f"doc store at {store.path} has no {text_col!r} column "
            f"(schema: {fetched.schema.names}); RM3 feedback needs the "
            "document text")
    doc_text = dict(zip(fetched.column(store.id_column).to_pylist(),
                        fetched.column(text_col).to_pylist()))

    fb: collections.defaultdict[str, float] = collections.defaultdict(float)
    score_sum = sum(h["score"] for h in hits) or 1.0
    for h in hits:
        toks = (doc_text.get(h["doc_id"]) or "").split()
        if not toks:
            continue
        dl = len(toks)
        w_d = h["score"] / score_sum
        for t, tf in collections.Counter(toks).items():
            fb[t] += w_d * tf / dl
    top = sorted(fb.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
    z = sum(p for _, p in top) or 1.0
    fb_model = {t: p / z for t, p in top}

    a = original_query_weight
    out: dict[str, float] = {}
    for t in set(orig) | set(fb_model):
        out[t] = a * orig.get(t, 0.0) + (1 - a) * fb_model.get(t, 0.0)
    return out


def search_rm3(
    searcher: IndexSearcher,
    store: DocStore,
    query_text: str,
    k: int | None = None,
    **kwargs,
) -> list[dict]:
    """Expanded-query search (the reference's rm3=true retrieval)."""
    from .engine import DEFAULT_K

    weights = rm3_expand(searcher, store, query_text, **kwargs)
    return searcher.search_weighted(weights, k or DEFAULT_K)
