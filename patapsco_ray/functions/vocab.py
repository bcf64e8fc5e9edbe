"""Corpus vocabulary / n-gram statistics and TF-IDF keyword extraction.

Three operators a training-data pipeline uses to characterize and
index a web corpus (complementing the per-document signals in
:mod:`.textstats`):

- :func:`top_ngrams` — corpus-wide most-frequent token n-grams
  (boilerplate discovery, contamination screening, stopword mining);
- :func:`tfidf_topk_terms` — per-document top-k TF-IDF keywords
  (cheap sparse document descriptors / routing keys);
- :func:`vocab_stats` — one-row corpus summary (vocabulary size,
  token count, hapax count, max collection frequency).

Tokenization is the dedup-family convention shared with the DuckDB
oracles (lowercase, split on single spaces, empties dropped — see
:func:`.textstats._tokens`).

Shape for 100 TB:

- every corpus-wide count pre-aggregates inside each batch
  (``np.unique`` with counts) so only distinct ``(key, count)`` rows
  enter the one ``groupby.sum`` shuffle — the partial-agg-before-
  groupby pattern used by the index global stats;
- ``top_ngrams``' final top-k never sorts the full n-gram vocabulary:
  each post-groupby block emits its LOCAL top-k first, so the global
  sort+limit runs over ≤ k·num_blocks rows;
- ``tfidf_topk_terms`` broadcasts the quantized-IDF model once via
  ``ray.put`` (vocabulary-bounded, the :func:`.textstats.unigram_logprob`
  posture) and scores+ranks inside ONE shuffle-free ``map_batches``
  (a document's term frequencies are complete within its batch);
  determinism comes from integer arithmetic — ``tf · floor(ln(N/df)·s
  + 0.5)`` — so the Ray ranks and the SQL oracle's agree bit-for-bit.
"""

from __future__ import annotations

import logging
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .textstats import _tokens

__all__ = ["top_ngrams", "tfidf_topk_terms", "vocab_stats"]

_LOG = logging.getLogger(__name__)


def _ngram_strings(tbl: pa.Table, text_column: str, n: int) -> pa.Array:
    """All n-token window strings of a batch (every occurrence, not
    per-doc distinct), windows never crossing document boundaries."""
    flat, parent, nonempty = _tokens(tbl.column(text_column))
    nrows = tbl.num_rows
    if parent.size == 0:
        return pa.array([], pa.string())
    counts = np.bincount(parent, weights=nonempty.astype(np.float64),
                         minlength=nrows).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    total = int(offsets[-1])
    if total < n:
        return pa.array([], pa.string())
    kept = flat.filter(pa.array(nonempty))
    starts = np.arange(total - n + 1, dtype=np.int64)
    doc_of = np.searchsorted(offsets, starts, side="right") - 1
    valid = starts + n <= offsets[doc_of + 1]
    vstarts = starts[valid]
    if not vstarts.size:
        return pa.array([], pa.string())
    parts = [kept.take(pa.array(vstarts + j)) for j in range(n)]
    sep = pa.array([" "] * len(vstarts), pa.string())
    grams = pc.binary_join_element_wise(*parts, sep)
    if isinstance(grams, pa.ChunkedArray):
        grams = grams.combine_chunks()
    return grams


def top_ngrams(
    ds: ray.data.Dataset,
    *,
    n: int = 2,
    k: int = 100,
    text_column: str = "text",
    min_count: int = 2,
) -> ray.data.Dataset:
    """Corpus-wide top-``k`` token ``n``-grams by occurrence count.

    Returns ``(ngram, n_occurrences)`` — the ``k`` most frequent
    ``n``-token windows (every occurrence counts; windows never cross
    document boundaries), ties broken by n-gram ascending, n-grams
    below ``min_count`` excluded. The head of this table is the
    corpus's boilerplate/stock-phrase profile.

    Dataflow: per-batch ``np.unique`` combiner -> ``groupby.sum`` (the
    only shuffle; only distinct (ngram, count) rows move) -> per-block
    LOCAL top-k -> global sort+limit over ≤ k·num_blocks rows. The
    full n-gram vocabulary is never globally sorted or driver-collected.
    """
    out_schema = pa.schema([("ngram", pa.string()),
                            ("n_occurrences", pa.int64())])

    def partial(tbl: pa.Table) -> pa.Table:
        grams = _ngram_strings(tbl, text_column, n)
        if len(grams) == 0:
            return pa.table({"ngram": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        uniq, counts = np.unique(
            np.asarray(grams.to_numpy(zero_copy_only=False), dtype=object)
            .astype(str), return_counts=True)
        return pa.table({"ngram": pa.array(uniq.tolist(), pa.string()),
                         "c": pa.array(counts.astype(np.int64))})

    def local_topk(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        t = pa.table({"ngram": tbl.column("ngram"),
                      "n_occurrences": tbl.column("sum(c)")})
        t = t.filter(pc.greater_equal(t.column("n_occurrences"),
                                      pa.scalar(min_count)))
        if t.num_rows > k:
            order = pc.sort_indices(t, sort_keys=[
                ("n_occurrences", "descending"), ("ngram", "ascending")])
            t = t.take(order.slice(0, k))
        return t.cast(out_schema)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ngram").sum("c")
        .map_batches(local_topk, batch_format="pyarrow")
        .sort(["n_occurrences", "ngram"], descending=[True, False])
        .limit(k)
    )


def _df_dataset(ds: ray.data.Dataset, text_column: str
                ) -> ray.data.Dataset:
    """Corpus document frequencies as a DISTRIBUTED ``(term, df)``
    dataset: per-batch distinct-(doc, term) combiner (only
    (term, partial_df) rows cross the shuffle), one term groupby.
    Nothing reaches the driver — the vocabulary stays sharded across
    the cluster object store, the same posture as the index's sharded
    ``global_terms`` table (index/build_shuffle.py)."""

    def partial(tbl: pa.Table) -> pa.Table:
        flat, parent, nonempty = _tokens(tbl.column(text_column))
        if parent.size == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        toks = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)
        toks = toks[nonempty].astype(str)
        parent = parent[nonempty]
        # distinct (doc, term) inside the batch, then count docs per term
        uniq, inv = np.unique(toks, return_inverse=True)
        pairs = np.unique(parent * np.int64(len(uniq)) + inv)
        term_idx = pairs % len(uniq)
        df = np.bincount(term_idx, minlength=len(uniq)).astype(np.int64)
        return pa.table({"term": pa.array(uniq.tolist(), pa.string()),
                         "df": pa.array(df)})

    def rename(tbl: pa.Table) -> pa.Table:
        return tbl.rename_columns(["term", "df"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term").sum("df")
        .map_batches(rename, batch_format="pyarrow")
    )


def tfidf_topk_terms(
    ds: ray.data.Dataset,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 5,
    scale: int = 1_000_000,
    min_df: int = 1,
    broadcast_max_terms: int = 2_000_000,
    join_partitions: int | None = None,
    rank_partitions: int = 256,
) -> ray.data.Dataset:
    """Per-document top-``k`` TF-IDF keywords.

    Returns ``(id, term, rank, tfidf_q)`` — for each document its
    ``k`` highest-scoring terms under ``score = tf · qidf(term)`` with
    ``qidf = floor(ln(N / df) · scale + 0.5)`` (``N`` = corpus document
    count, ``df`` = document frequency), ``rank`` 0-based ordered by
    (score desc, term asc). Because ``qidf`` is quantized ONCE
    driver-side and scores are integer products, ranking is exactly
    reproducible by the SQL oracle (no float-comparison hazards).

    Scale posture — adaptive, never vocabulary-bounded on the driver:
    the ``(term, df)`` model is computed as a DISTRIBUTED dataset
    (:func:`_df_dataset`) and its size checked with a ``count()``
    before anything is collected. At or below ``broadcast_max_terms``
    distinct terms (the common case; covers any bounded corpus), the
    model collapses to a broadcast dict (``ray.put`` once) and
    scoring + per-document ranking run in ONE shuffle-free
    ``map_batches`` — a doc's term frequencies are complete within its
    batch, vectorized via ``np.unique`` factorization + one lexsort
    per batch. Above the cap (a 100-TB web corpus has O(10^9) distinct
    terms — no single node may hold the vocabulary) the model stays
    sharded and the corpus joins it: (doc, term, tf) rows
    hash-partition-join the (term, qidf) table on ``term``, then a
    coarse hash(doc)-partitioned grouped top-k ranks per document
    (Python per PARTITION, never per doc). Both paths produce
    identical rows (same quantized-integer arithmetic, same
    tie-breaks) — ``tests/test_vocab.py`` asserts it.
    """
    n_docs = ds.count()
    dft = _df_dataset(ds, text_column).materialize()
    n_terms = dft.count()
    if n_terms > broadcast_max_terms:
        _LOG.info(
            "tfidf_topk_terms: %d distinct terms > broadcast_max_terms=%d"
            " — using the distributed join path", n_terms,
            broadcast_max_terms)
        return _tfidf_join_path(
            ds, dft, n_docs, id_column=id_column, text_column=text_column,
            k=k, scale=scale, min_df=min_df,
            join_partitions=join_partitions,
            rank_partitions=rank_partitions)
    df = {r["term"]: int(r["df"]) for r in dft.take_all()}
    qidf = {
        t: int(math.floor(math.log(n_docs / d) * scale + 0.5))
        for t, d in df.items() if d >= min_df
    }
    qidf_ref = ray.put(qidf)

    def fn(tbl: pa.Table) -> pa.Table:
        idt = tbl.column(id_column).type
        empty = pa.table({
            id_column: pa.array([], idt),
            "term": pa.array([], pa.string()),
            "rank": pa.array([], pa.int64()),
            "tfidf_q": pa.array([], pa.int64())})
        flat, parent, nonempty = _tokens(tbl.column(text_column))
        if parent.size == 0:
            return empty
        model = ray.get(qidf_ref)
        toks = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)
        toks = toks[nonempty].astype(str)
        parent = parent[nonempty]
        if toks.size == 0:
            return empty
        uniq, inv = np.unique(toks, return_inverse=True)
        # tf per (doc, distinct term) via combined integer keys
        keys = parent * np.int64(len(uniq)) + inv
        ukeys, tf = np.unique(keys, return_counts=True)
        docs = (ukeys // len(uniq)).astype(np.int64)
        tidx = (ukeys % len(uniq)).astype(np.int64)
        uniq_q = np.array([model.get(t, 0) for t in uniq], dtype=np.int64)
        score = tf.astype(np.int64) * uniq_q[tidx]
        # rank within doc by (score desc, term asc); ukeys are already
        # sorted by (doc, term-code) and term codes are term-ascending,
        # so a stable sort on -score preserves the term tie-break
        order = np.lexsort((tidx, -score, docs))
        d_sorted = docs[order]
        newdoc = np.ones(d_sorted.size, dtype=bool)
        newdoc[1:] = d_sorted[1:] != d_sorted[:-1]
        rank = np.arange(d_sorted.size, dtype=np.int64) - np.repeat(
            np.flatnonzero(newdoc), np.diff(
                np.append(np.flatnonzero(newdoc), d_sorted.size)))
        keep = rank < k
        sel = order[keep]
        ids = tbl.column(id_column).take(pa.array(docs[sel]))
        terms = pa.array(uniq[tidx[sel]].tolist(), pa.string())
        return pa.table({
            id_column: ids,
            "term": terms,
            "rank": pa.array(rank[keep]),
            "tfidf_q": pa.array(score[sel]),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _tfidf_join_path(
    ds: ray.data.Dataset,
    dft: ray.data.Dataset,
    n_docs: int,
    *,
    id_column: str,
    text_column: str,
    k: int,
    scale: int,
    min_df: int,
    join_partitions: int | None,
    rank_partitions: int,
) -> ray.data.Dataset:
    """Web-scale TF-IDF ranking with the vocabulary model kept SHARDED:
    (doc, term, tf) rows left-outer-join the (term, qidf) model on
    ``term`` (hash-partitioned both sides — the only place the corpus
    meets the model), then a coarse hash(doc)-partitioned grouped
    top-k ranks each document's terms vectorized (one Python call per
    PARTITION). No stage's memory grows with the corpus vocabulary."""
    from ..util import auto_join_partitions
    from .dedup import _hash_part
    from .spans import _codes
    from .windows import _field_type, _pin

    if join_partitions is None:
        join_partitions = auto_join_partitions()
    idt = _field_type(ds, id_column)
    model_schema = pa.schema([("term", pa.string()), ("qidf", pa.int64())])

    def to_model(tbl: pa.Table) -> pa.Table:
        dfv = tbl.column("df").to_numpy()
        keep = dfv >= min_df
        terms = tbl.column("term").combine_chunks().filter(pa.array(keep))
        # scalar libm log per DISTINCT term: this stage is vocabulary-
        # bounded and runs once per term across the cluster; np.log's
        # SIMD lanes are not bit-identical to libm, and the
        # quantization contract (driver math.log == SQL ln) must hold
        # on this path exactly as on the broadcast path
        nkeep = int(keep.sum())
        q = np.fromiter(
            (math.floor(math.log(n_docs / d) * scale + 0.5)
             for d in dfv[keep]),
            dtype=np.int64, count=nkeep)
        return pa.table({"term": terms, "qidf": pa.array(q)})

    model = dft.map_batches(to_model, batch_format="pyarrow").map_batches(
        _pin(model_schema), batch_format="pyarrow")

    dt_schema = pa.schema([(id_column, idt), ("term", pa.string()),
                           ("tf", pa.int64())])

    def emit(tbl: pa.Table) -> pa.Table:
        flat, parent, nonempty = _tokens(tbl.column(text_column))
        if parent.size == 0:
            return dt_schema.empty_table()
        toks = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)
        toks = toks[nonempty].astype(str)
        parent = parent[nonempty]
        if toks.size == 0:
            return dt_schema.empty_table()
        uniq, inv = np.unique(toks, return_inverse=True)
        keys = parent * np.int64(len(uniq)) + inv
        ukeys, tf = np.unique(keys, return_counts=True)
        docs = (ukeys // len(uniq)).astype(np.int64)
        tidx = (ukeys % len(uniq)).astype(np.int64)
        return pa.table({
            id_column: tbl.column(id_column).take(pa.array(docs)),
            "term": pa.array(uniq[tidx].tolist(), pa.string()),
            "tf": pa.array(tf.astype(np.int64)),
        })

    dt = ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True
                        ).map_batches(_pin(dt_schema),
                                      batch_format="pyarrow")
    joined = dt.join(model, join_type="left_outer",
                     num_partitions=join_partitions, on=("term",))

    def score_part(tbl: pa.Table) -> pa.Table:
        q = pc.fill_null(pc.cast(tbl.column("qidf"), pa.int64()),
                         pa.scalar(0, pa.int64()))
        score = pc.multiply_checked(tbl.column("tf"), q)
        return pa.table({
            id_column: tbl.column(id_column),
            "term": tbl.column("term"),
            "score": score,
            "part": _hash_part(tbl.column(id_column), rank_partitions,
                               seed=11),
        })

    out_schema = pa.schema([(id_column, idt), ("term", pa.string()),
                            ("rank", pa.int64()), ("tfidf_q", pa.int64())])

    def rank_part(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return out_schema.empty_table()
        ids = grp.column(id_column).combine_chunks()
        codes = _codes(ids)
        terms = np.asarray(grp.column("term").to_numpy(
            zero_copy_only=False), dtype=object)
        score = grp.column("score").to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        # (doc, score desc, term asc) — the broadcast path's exact
        # tie-break (term codes there are np.unique-sorted == term asc)
        order = np.lexsort((terms, -score, codes))
        c_sorted = codes[order]
        newdoc = np.ones(c_sorted.size, dtype=bool)
        newdoc[1:] = c_sorted[1:] != c_sorted[:-1]
        starts = np.flatnonzero(newdoc)
        rank = np.arange(c_sorted.size, dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, c_sorted.size)))
        keep = rank < k
        sel = order[keep]
        return pa.table({
            id_column: ids.take(pa.array(sel)),
            "term": pa.array(terms[sel].tolist(), pa.string()),
            "rank": pa.array(rank[keep]),
            "tfidf_q": pa.array(score[sel]),
        }).cast(out_schema)

    return (joined.map_batches(score_part, batch_format="pyarrow")
            .groupby("part").map_groups(rank_part, batch_format="pyarrow")
            .map_batches(_pin(out_schema), batch_format="pyarrow"))


def vocab_stats(
    ds: ray.data.Dataset, *, text_column: str = "text"
) -> pa.Table:
    """One-row corpus vocabulary summary:
    ``(n_terms, n_tokens, n_hapax, max_cf)`` — distinct-term count,
    total token count, hapax-legomena count (cf == 1) and the maximum
    collection frequency. Partial-agg combiner -> term groupby ->
    per-block partial fold -> one tiny driver reduction (four int64s
    per block)."""

    def partial(tbl: pa.Table) -> pa.Table:
        flat, _, nonempty = _tokens(tbl.column(text_column))
        if len(flat) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "cf": pa.array([], pa.int64())})
        toks = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)
        toks = toks[nonempty]
        uniq, counts = np.unique(toks.astype(str), return_counts=True)
        return pa.table({"term": pa.array(uniq.tolist(), pa.string()),
                         "cf": pa.array(counts.astype(np.int64))})

    def fold(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"n_terms": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "n_hapax": pa.array([], pa.int64()),
                             "max_cf": pa.array([], pa.int64())})
        cf = tbl.column("sum(cf)").to_numpy()
        return pa.table({
            "n_terms": pa.array([tbl.num_rows], pa.int64()),
            "n_tokens": pa.array([int(cf.sum())], pa.int64()),
            "n_hapax": pa.array([int((cf == 1).sum())], pa.int64()),
            "max_cf": pa.array([int(cf.max())], pa.int64()),
        })

    parts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term").sum("cf")
        .map_batches(fold, batch_format="pyarrow")
        .take_all()
    )
    return pa.table({
        "n_terms": pa.array([sum(p["n_terms"] for p in parts)], pa.int64()),
        "n_tokens": pa.array([sum(p["n_tokens"] for p in parts)], pa.int64()),
        "n_hapax": pa.array([sum(p["n_hapax"] for p in parts)], pa.int64()),
        "max_cf": pa.array(
            [max((p["max_cf"] for p in parts), default=0)], pa.int64()),
    })
