"""Reranking stages.

Reference surface (/root/reference/patapsco/rerank.py):
- ``MockReranker`` (rerank.py:52-67): deep-copies results and exercises
  doc-database lookups — used by e2e tests.
- ``ShellReranker`` (rerank.py:70-172): the user escape hatch — writes
  the batch to a file, invokes
  ``script doc_lang query_lang db input output [--key value ...]``,
  reads a TREC run file back.

Ray mapping: a reranker is a callable CLASS for ``map_batches`` over
the flat results table, holding its DocStore handle (and any model)
per actor. Batches contain whole queries when produced by
``groupby("query_id")`` upstream; rerankers only reorder/rescore
within a query, so row-level batching is also safe for scoring-only
rerankers.
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import tempfile

import pyarrow as pa

import ray.data

from ..util import fixed_pool

from .docstore import DocStore


class MockReranker:
    """Identity rerank that pulls every doc from the store (reference
    rerank.py:52-67)."""

    def __init__(self, store_path: str):
        self.store = DocStore(store_path)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        doc_ids = [str(d) for d in set(tbl.column("doc_id").to_pylist())]
        if doc_ids:
            found = self.store.lookup(doc_ids, columns=[self.store.id_column])
            if found.num_rows != len(doc_ids):
                missing = set(doc_ids) - set(
                    found.column(self.store.id_column).to_pylist()
                )
                raise KeyError(f"doc store missing ids: {sorted(missing)[:5]}")
        return tbl


class ShellReranker:
    """Shell out to a user script per batch (reference rerank.py:70-172).

    Batch rows are written as JSONL records
    ``{query_id, doc_id, rank, score, text}`` (text fetched from the
    doc store — the reference passes a db handle instead); the script
    is invoked as ``script doc_lang query_lang store_path input output
    [--key value ...]`` and must write a TREC run file to ``output``.
    """

    def __init__(self, store_path: str, script: str,
                 doc_lang: str = "eng", query_lang: str = "eng",
                 extra_args: dict | None = None):
        self.store = DocStore(store_path)
        self.store_path = store_path
        self.script = script
        self.doc_lang = doc_lang
        self.query_lang = query_lang
        self.extra_args = extra_args or {}

    def __call__(self, tbl: pa.Table) -> pa.Table:
        doc_ids = [str(d) for d in tbl.column("doc_id").to_pylist()]
        texts = {}
        if doc_ids:
            fetched = self.store.lookup(sorted(set(doc_ids)))
            text_col = (
                "original_text"
                if "original_text" in fetched.schema.names
                else fetched.schema.names[-1]
            )
            texts = dict(
                zip(
                    fetched.column(self.store.id_column).to_pylist(),
                    fetched.column(text_col).to_pylist(),
                )
            )
        with tempfile.TemporaryDirectory() as tmp:
            inp = pathlib.Path(tmp) / "input.jsonl"
            out = pathlib.Path(tmp) / "output.trec"
            with open(inp, "w") as fp:
                for row in tbl.to_pylist():
                    fp.write(json.dumps({
                        "query_id": str(row["query_id"]),
                        "doc_id": str(row["doc_id"]),
                        "rank": int(row["rank"]),
                        "score": float(row["score"]),
                        "text": texts.get(str(row["doc_id"]), ""),
                    }) + "\n")
            cmd = [self.script, self.doc_lang, self.query_lang,
                   str(self.store_path), str(inp), str(out)]
            for key, value in self.extra_args.items():  # schema.py:194-199
                cmd.extend([f"--{key}", str(value)])
            subprocess.run(cmd, check=True, capture_output=True)
            qids, docs, ranks, scores = [], [], [], []
            for line in out.read_text().splitlines():
                if not line.strip():
                    continue
                p = line.split()
                qids.append(p[0]); docs.append(p[2])
                ranks.append(int(p[3])); scores.append(float(p[4]))
        return pa.table({
            "query_id": pa.array(qids, pa.string()),
            "doc_id": pa.array(docs, pa.string()),
            "rank": pa.array(ranks, pa.int32()),
            "score": pa.array(scores, pa.float64()),
        })


def rerank_results(
    results: ray.data.Dataset,
    reranker_cls,
    *,
    constructor_kwargs: dict,
    concurrency: int | tuple[int, int] = (1, 4),
) -> ray.data.Dataset:
    """Apply a reranker actor pool query-by-query.

    The reranker class runs INSIDE ``groupby().map_groups`` so every
    invocation sees exactly one query's complete candidate list — a
    downstream ``map_batches`` with its own batch size could split or
    merge blocks across query boundaries and hand the reranker a
    partial run (reference rerank.py:70-172 scripts assume complete
    per-query input)."""
    return results.groupby("query_id").map_groups(
        reranker_cls,
        fn_constructor_kwargs=constructor_kwargs,
        batch_format="pyarrow",
        concurrency=fixed_pool(concurrency),
    )
