"""Distributed retrieval as a Ray Data pipeline.

``IndexSearcher`` serves one process; this module fans a query set out
across the cluster. Two axes (both Dataset pipelines — Ray schedules,
retries, and backpressures):

- ``search_dataset``: partition by QUERIES. Each actor holds a full
  searcher (norms cached per actor, term postings fetched per query
  via parquet predicate pushdown) and processes a batch of queries.
  Right when the index's per-segment norm tables fit one node —
  queries are embarrassingly parallel.

- ``search_dataset_by_segment``: partition by (query-batch x SEGMENT).
  Each task scores one segment slice and a groupby(query_id) merges
  per-segment candidate lists with the (score desc, global ordinal
  asc) tie-break. Right at 10^12-doc scale where no node holds every
  segment; the shuffle payload is only k rows per (query, segment).
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..util import fixed_pool

from .engine import DEFAULT_K, IndexSearcher, lookup_global_stats, process_query


class _QuerySearcher:
    """Actor payload for query-partitioned search.

    ``mode``:

    - "plain": one batched two-phase search (global stats prefetched
      once per batch).
    - "rm3": pseudo-relevance feedback per query — the actor holds the
      searcher AND a doc store, so the two-pass expansion (feedback
      search -> term model from stored doc text -> weighted rescore,
      reference retrieve.py:104-113) fans out with the query
      partition instead of looping on the driver.
    - "psq": each query string is the reference's PSQ clause syntax
      (``psq AND (t1^p1 ...) AND ...``, topics.py:433-442), scored
      with projected-statistics BM25.
    - "phrase": each query string is an exact-adjacency phrase
      (positional index required — ``build_index(positions=True)``).
    - "lucene": each query string is Lucene syntax (boosts, +/-,
      AND/OR, groups, quoted phrases on positional indexes) evaluated
      through :func:`.luceneq.search_lucene`.
    """

    def __init__(self, index_dir: str, k: int, mode: str = "plain",
                 doc_store_dir: str | None = None,
                 rm3_kwargs: dict | None = None, **searcher_kwargs):
        self.searcher = IndexSearcher(index_dir, **searcher_kwargs)
        self.k = k
        self.mode = mode
        self.rm3_kwargs = rm3_kwargs or {}
        if mode == "rm3":
            if doc_store_dir is None:
                raise ValueError(
                    "mode='rm3' needs doc_store_dir (RM3 feedback reads "
                    "document text from the doc store)")
            from ..stages.docstore import DocStore

            self.store = DocStore(doc_store_dir)
        elif mode not in ("plain", "psq", "phrase", "lucene"):
            raise ValueError(f"unknown search mode {mode!r}")

    def __call__(self, tbl: pa.Table) -> pa.Table:
        queries = list(zip(
            [str(q) for q in tbl.column("query_id").to_pylist()],
            tbl.column("query").to_pylist(),
        ))
        if self.mode == "plain":
            return self.searcher.search_batch(queries, k=self.k)
        if self.mode == "rm3":
            from .rm3 import search_rm3

            def run(text):
                return search_rm3(self.searcher, self.store, text,
                                  k=self.k, **self.rm3_kwargs)
        elif self.mode == "phrase":
            def run(text):
                return self.searcher.search_phrase(text, k=self.k)
        elif self.mode == "lucene":
            from .luceneq import search_lucene

            def run(text):
                return search_lucene(self.searcher, text, k=self.k)
        else:  # psq
            def run(text):
                return self.searcher.search_psq(text, k=self.k)

        out_q, out_d, out_r, out_s = [], [], [], []
        for qid, text in queries:
            for hit in run(text):
                out_q.append(qid)
                out_d.append(hit["doc_id"])
                out_r.append(hit["rank"])
                out_s.append(hit["score"])
        return pa.table({
            "query_id": pa.array(out_q, pa.string()),
            "doc_id": pa.array(out_d, pa.string()),
            "rank": pa.array(out_r, pa.int32()),
            "score": pa.array(out_s, pa.float64()),
        })


def search_dataset(
    queries: ray.data.Dataset | pa.Table,
    index_dir: str,
    *,
    k: int = DEFAULT_K,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 32,
    mode: str = "plain",
    doc_store_dir: str | None = None,
    rm3_kwargs: dict | None = None,
    **searcher_kwargs,
) -> ray.data.Dataset:
    """Query-partitioned distributed search; input needs columns
    (query_id, query); output is the flat results table
    (query_id, doc_id, rank, score). ``mode`` selects plain batched
    search, per-query RM3 expansion (needs ``doc_store_dir``), PSQ
    clause scoring, exact-adjacency phrases, or Lucene boolean syntax
    — see :class:`_QuerySearcher`."""
    if isinstance(queries, pa.Table):
        queries = ray.data.from_arrow(queries)
    # a small query table often arrives as ONE block; map_batches
    # cannot split a block across the actor pool, so without an
    # explicit repartition a 66-query table runs on a single actor
    # while the rest of the pool idles (measured 76.7 s -> 30.1 s cold
    # at 12M docs / 8 actors; cold per-actor norm loads dominate the
    # remainder). count() here is metadata-only for in-memory and
    # parquet-backed query tables.
    import math

    nq = queries.count()
    target_blocks = max(1, math.ceil(nq / max(batch_size, 1)))
    if target_blocks > queries.num_blocks():
        queries = queries.repartition(target_blocks)
    return queries.map_batches(
        _QuerySearcher,
        fn_constructor_kwargs={"index_dir": index_dir, "k": k,
                               "mode": mode,
                               "doc_store_dir": doc_store_dir,
                               "rm3_kwargs": rm3_kwargs,
                               **searcher_kwargs},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=fixed_pool(concurrency),
    )


class _SegmentSearcher:
    """Scores one segment for a broadcast query set."""

    def __init__(self, index_dir: str, queries_ref, k: int,
                 **searcher_kwargs):
        self.searcher = IndexSearcher(index_dir, **searcher_kwargs)
        self.k = k
        # processed query terms + global stats are computed ONCE on the
        # driver and broadcast via ray.put — re-deriving them per actor
        # would repeat the query-processing chain and the global-stats
        # pushdown read n_actors times
        self.qterms, self.gstats = ray.get(queries_ref)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        out_q, out_d, out_o, out_s = [], [], [], []
        for seg_idx in tbl.column("seg_index").to_pylist():
            seg = self.searcher.manifest["segments"][int(seg_idx)]
            ss = self.searcher._segment(seg)
            for qid, counts in self.qterms:
                if not counts:
                    continue
                ords, scores = ss.score(counts, self.searcher.scorer,
                                        self.gstats, self.k)
                if ords.size == 0:
                    continue
                doc_ids = ss.doc_ids_for(ords)
                base = seg["base"]
                out_q.extend([qid] * len(ords))
                out_d.extend(doc_ids)
                out_o.extend((base + ords).tolist())
                out_s.extend(scores.tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.string()),
            "doc_id": pa.array(out_d, pa.string()),
            "global_ordinal": pa.array(out_o, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })


def search_dataset_by_segment(
    queries: pa.Table | list[tuple[str, str]],
    index_dir: str,
    *,
    k: int = DEFAULT_K,
    concurrency: int | tuple[int, int] = (1, 8),
    **searcher_kwargs,
) -> ray.data.Dataset:
    """Segment-partitioned distributed search with a groupby merge."""
    if isinstance(queries, pa.Table):
        qlist = list(zip(
            [str(q) for q in queries.column("query_id").to_pylist()],
            queries.column("query").to_pylist(),
        ))
    else:
        qlist = list(queries)
    driver_searcher = IndexSearcher(index_dir, **searcher_kwargs)
    qterms = []
    for qid, text in qlist:
        terms = process_query(text, driver_searcher.processor)
        counts: dict[str, int] = {}
        for t in terms:
            counts[t] = counts.get(t, 0) + 1
        qterms.append((qid, counts))
    all_terms = sorted({t for _, c in qterms for t in c})
    gstats = lookup_global_stats(index_dir, all_terms)
    qref = ray.put((qterms, gstats))
    manifest = driver_searcher.manifest
    seg_ds = ray.data.from_items(
        [{"seg_index": i} for i in range(len(manifest["segments"]))]
    )
    per_segment = seg_ds.map_batches(
        _SegmentSearcher,
        fn_constructor_kwargs={"index_dir": index_dir, "queries_ref": qref,
                               "k": k, **searcher_kwargs},
        batch_format="pyarrow",
        batch_size=1,
        concurrency=fixed_pool(concurrency),
    )

    def merge(grp: pa.Table) -> pa.Table:
        rows = list(zip(
            [-s for s in grp.column("score").to_pylist()],
            grp.column("global_ordinal").to_pylist(),
            grp.column("doc_id").to_pylist(),
        ))
        top = heapq.nsmallest(k, rows)
        n = len(top)
        return pa.table({
            "query_id": grp.column("query_id").slice(0, 1).take(
                pa.array(np.zeros(n, dtype=np.int64))),
            "doc_id": pa.array([d for _, _, d in top], pa.string()),
            "rank": pa.array(np.arange(n, dtype=np.int32)),
            "score": pa.array([-negs for negs, _, _ in top], pa.float64()),
        })

    return per_segment.groupby("query_id").map_groups(
        merge, batch_format="pyarrow"
    )
