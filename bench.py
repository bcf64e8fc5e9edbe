#!/usr/bin/env python
"""Benchmark harness (driver contract + BASELINE.md protocol).

Default mode: ``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)``
(default 32), run the headline pipelines, print ONE JSON line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N}

Headline = the north-rule pipeline: inverted-index build (text chain ->
segment postings -> global term merge) over a deterministic synthetic
Common-Crawl-style corpus (input_hint schema; generated once under
/tmp and reused), then BM25 top-k search, plus the training-data
operators over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

``--scaling``: run the index build twice in FRESH subprocesses at
num_cpus=N and 4N (default N=2, override with ``SCALE_N``) on the same
corpus and report both throughputs plus scaling efficiency
((thr_4N/thr_N)/4) — the sandbox stand-in for the N-vs-4N-node cluster
criterion. N=2 is the default because this container exposes ~16
effective cores (multiprocessing burn test, BASELINE.md): at the 4N=16
level the actor pool plus the Ray runtime and driver already exceed
the machine's real parallel capacity, so 4->16 measures the box
ceiling; 2->8 keeps BOTH levels inside it, which is the honest
single-box analogue of N-node vs 4N-node clusters (on a real cluster
each node brings its own cores and memory bandwidth).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import pathlib
import shutil
import subprocess
import sys
import time


class _EmptyShuffleBundleFilter(logging.Filter):
    """Drop Ray's 'RefBundle with a different schema ... new schema: .'
    warning ONLY when the new schema is empty: Ray's sort/groupby
    operators emit schema-less bundles for empty shuffle partitions
    (our own stages pin explicit schemas, functions/windows.py). Any
    real schema mismatch (non-empty new schema) still surfaces."""

    def filter(self, record: logging.LogRecord) -> bool:
        msg = record.getMessage()
        return not ("different schema" in msg and "new schema: ." in msg)


class _SchemaMetadataHashFilter(logging.Filter):
    """Drop Ray's read-path 'Failed to hash the schemas (for
    deduplication): unhashable type' warning: parquet files written by
    pandas carry a schema-metadata dict that Ray's fragment-schema
    dedup cannot hash (pure read-time cosmetics — unification still
    runs, just without the early-exit). Fires inside read_parquet
    before any library code can strip the metadata."""

    def filter(self, record: logging.LogRecord) -> bool:
        msg = record.getMessage()
        return not ("Failed to hash the schemas" in msg
                    and "unhashable type" in msg)


logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).addFilter(_EmptyShuffleBundleFilter())
logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).addFilter(_SchemaMetadataHashFilter())

REPO = pathlib.Path(__file__).resolve().parent
# BENCH_CORPUS_ROWS overrides; --scaling uses a larger corpus (see
# main) so the fixed per-run cost (actor-pool ramp ~2 s + finalize)
# stays a small fraction of the timed window at the high cpu level —
# the 100-TB design point has effectively zero fixed-cost fraction,
# so a corpus too small UNDER-states the engine's scaling.
CORPUS_ROWS = int(os.environ.get("BENCH_CORPUS_ROWS", "3000000"))
CORPUS_DIR = ("/tmp/patapsco_bench_corpus" if CORPUS_ROWS == 3_000_000
              else f"/tmp/patapsco_bench_corpus_{CORPUS_ROWS}")
CORPUS_FILES = max(8, CORPUS_ROWS // 62_500)
SCALING_ROWS = 12_000_000  # fixed per-run costs (finalize ~4.5 s +
# actor ramp ~2 s) are ~2% of the 8-cpu window at this size; smaller
# corpora mechanically understate efficiency (BASELINE.md)
ROWS_PER_SEGMENT = 12_500  # ~120 segments at 1.5M rows: many
# scheduling waves per CPU level (load balance) while keeping
# per-segment fixed costs (file opens at query time, task dispatch)
# amortized; production segments would be far larger still


def ensure_corpus() -> list[str]:
    from patapsco_ray.sources import generate_webpages

    marker = pathlib.Path(CORPUS_DIR) / ".complete"
    if marker.exists():
        return sorted(str(p) for p in pathlib.Path(CORPUS_DIR).glob("*.parquet"))
    shutil.rmtree(CORPUS_DIR, ignore_errors=True)
    paths = generate_webpages(
        CORPUS_DIR, CORPUS_ROWS, num_files=CORPUS_FILES, html_fraction=0.05
    )
    marker.touch()
    return paths


def run_headline(num_cpus: int, index_dir: str) -> dict:
    """Index build + search timings; assumes ray is initialised."""
    from patapsco_ray.index import build_index
    from patapsco_ray.search import IndexSearcher
    from patapsco_ray.text import TextConfig

    paths = ensure_corpus()
    shutil.rmtree(index_dir, ignore_errors=True)
    cfg = TextConfig(stem="porter")  # full reference chain: normalize +
    # tokenize + lucene stopwords (identify pre-stem, remove post-stem)
    # warmup: spin up the worker pool + imports on a small slice so the
    # timed run measures sustained throughput (what a 10^12-doc job
    # sees), not Python cold-start
    warm_dir = index_dir + ".warmup"
    shutil.rmtree(warm_dir, ignore_errors=True)
    # enough warmup segments that every worker slot runs one (idle Ray
    # workers keep their imports; the timed pool's actors reuse them)
    build_index(paths[:2], warm_dir, text_config=cfg,
                rows_per_segment=max(2048, 125_000 // max(num_cpus, 1)),
                concurrency=num_cpus)
    shutil.rmtree(warm_dir, ignore_errors=True)
    # best-of-N (default 3): single runs on this shared box can lose
    # 2x throughput to co-tenant bursts (see BASELINE.md variance
    # note); the min-time run is the least-interference estimate, and
    # its manifest (incl. finalize_sec) is the one reported so the
    # headline numbers all come from the same run
    repeats = int(os.environ.get("BENCH_BUILD_REPEATS", "3"))
    build_s = float("inf")
    manifest = None
    for _ in range(max(repeats, 1)):
        shutil.rmtree(index_dir, ignore_errors=True)
        t0 = time.time()
        m = build_index(
            paths,
            index_dir,
            text_config=cfg,
            rows_per_segment=ROWS_PER_SEGMENT,
            concurrency=num_cpus,
        )
        dt = time.time() - t0
        if dt < build_s:
            build_s, manifest = dt, m

    searcher = IndexSearcher(index_dir)
    qset = [
        ("q1", "world state people government"),
        ("q2", "work life time year"),
        ("q3", "term00123 term04567"),
        ("q4", "great little new old"),
        ("q5", "men man day way"),
    ]
    # best-of-3: run 1 pays the cold parquet page cache (segment term
    # tables + norms); r4's apparent search_topk "regression" (2.26 ->
    # 4.23 s) was exactly this — best-of-2 with a cold first run on a
    # noisy window. Re-measured r5 on the same 3M/248-segment index:
    # cold 3.6 s, warm 2.1-2.2 s, no engine change involved.
    search_s = float("inf")
    for _ in range(int(os.environ.get("BENCH_SEARCH_REPEATS", "3"))):
        t0 = time.time()
        res = searcher.search_batch(qset, k=1000)
        search_s = min(search_s, time.time() - t0)
    return {
        "ndocs": manifest["ndocs"],
        "build_sec": build_s,
        "docs_per_sec": manifest["ndocs"] / build_s,
        "finalize_sec": manifest.get("finalize_sec", 0.0),
        "search_sec": search_s,
        "result_rows": res.num_rows,
    }


def run_sf_ops(sf_dir: str) -> dict:
    """Training-data operator timings over the driver's sf tables.

    Best-of-N (BENCH_OPS_REPEATS, default 3): the first call of a query
    pays actor-pool spin-up and import cost, which dominated the
    round-2 "regressions" (token_counts 5.1 s cold vs 0.7 s warm at
    identical sf/cpus — box noise + cold start, not engine).
    ``minhash_lsh_pairs`` is timed as the real operator at
    threshold=0.5 over the raw corpus, NOT the driver's
    degenerate-oracle entry (which scores family-canonical texts — a
    different, pair-heavier workload).
    """
    import ray.data

    sys.path.insert(0, str(REPO))
    import __ray_entry__ as entry
    from patapsco_ray.functions import minhash_lsh_pairs

    from patapsco_ray.functions import near_dedup

    qs = entry.queries()
    qs["minhash_lsh_pairs"] = lambda sf: minhash_lsh_pairs(
        entry._docs(sf), threshold=0.5)
    # the END-TO-END dedup chain (minhash pairs -> connected
    # components -> surviving docs), not just the pair stage — the
    # 100-TB workhorse path, timed so tail regressions are visible
    qs["near_dedup"] = lambda sf: near_dedup(
        entry._docs(sf), method="minhash", threshold=0.5)

    def rm3_distributed_66(sf):
        # RM3 fanned out with the query partition (search_dataset
        # mode='rm3'), 66 queries composed from the index's head terms
        # — the fleet-of-queries shape the driver-loop RM3 cannot serve
        import pyarrow as pa
        import pyarrow.parquet as pq

        from patapsco_ray.search import search_dataset

        idx = entry._index_for(sf)
        store = entry._store_for(sf)
        t = pq.read_table(f"{idx}/global_terms", columns=["term", "df"])
        dfs = t.column("df").to_numpy(zero_copy_only=False)
        order = dfs.argsort()[::-1][:198]
        terms = t.column("term").take(pa.array(order)).to_pylist()
        nt = len(terms)
        qtbl = pa.table({
            "query_id": [f"q{i}" for i in range(66)],
            "query": [" ".join({terms[i % nt], terms[(i + 66) % nt],
                                terms[(i + 132) % nt]})
                      for i in range(66)],
        })
        return search_dataset(qtbl, idx, k=100, mode="rm3",
                              doc_store_dir=store, concurrency=(1, 8),
                              batch_size=8)

    qs["rm3_distributed_66q"] = rm3_distributed_66
    picks = [
        "bm25_topk",
        "token_counts",
        "quality_signals",
        "exact_duplicates",
        "minhash_lsh_pairs",
        "near_dedup",
        "rm3_distributed_66q",
        "cosine_topk",
        "window_agg",
        "sessionize",
        "repetition_signals",
        "pii_counts",
        "chunk_documents",
        "sample_by_hash",
        "duplicate_spans",
        "remove_dup_spans",
        "phrase_topk",
        "length_quantiles",
        "pack_sequences",
        "shuffle_by_hash",
        "top_ngrams",
        "tfidf_topk_terms",
        "kmeans_assign_counts",
        "select_by_token_budget",
        "importance_sample",
    ]
    repeats = int(os.environ.get("BENCH_OPS_REPEATS", "3"))
    out = {}
    for name in picks:
        best = float("inf")
        for _ in range(max(repeats, 1)):
            t0 = time.time()
            r = qs[name](sf_dir)
            if isinstance(r, ray.data.Dataset):
                r = r.materialize()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    return out


def run_scale_dedup(num_cpus: int) -> None:
    """Web-scale dedup chain over the 3M-row bench corpus (or
    BENCH_CORPUS_ROWS): minhash pair stage alone, then the full
    minhash -> connected components -> keep chain. The sf0.1 ops suite
    cannot see tail regressions in these stages (2k pairs vs millions
    of band rows), so this mode is the regression gate for the
    dedup-at-scale redesign (BASELINE.md round-3/4 notes)."""
    import ray
    import ray.data

    sys.path.insert(0, str(REPO))
    from patapsco_ray.functions import minhash_lsh_pairs, near_dedup

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False)
    paths = ensure_corpus()
    queries = {}

    import pyarrow as pa

    def inject_dups(tbl: pa.Table) -> pa.Table:
        # the Zipf-random corpus has essentially no natural near-dups
        # at threshold 0.5 (measured: 0 pairs at 3M), which would leave
        # the candidate/verify stages untested at scale. Re-key every
        # 20th row with one appended token (~175-token docs -> jaccard
        # ~0.98): ~5% dup volume, family size 2, no degenerate buckets.
        import numpy as np
        import pyarrow.compute as pc

        # skip the 5% html-only rows (empty text): their dups would all
        # become the identical one-token doc " dupmarkertoken" — one
        # giant C(n,2) family instead of size-2 families. The pick is a
        # HASH of the url, not a positional arange: batch boundaries
        # vary run to run, a row's url does not (measured 38,693 vs
        # 36,310 pairs across two runs with the arange pick)
        from patapsco_ray.functions.hashing import stable_hash_strings
        urls = tbl.column("url").combine_chunks().cast(pa.string())
        pick = (stable_hash_strings(urls) % np.uint64(20) == 0) & np.asarray(
            pc.not_equal(pc.fill_null(tbl.column("text"), ""), "")
            .to_numpy(zero_copy_only=False), dtype=bool)
        dup = tbl.filter(pa.array(pick))
        dup = pa.table({
            "url": pc.binary_join_element_wise(
                dup.column("url"), "#dup", ""),
            "text": pc.binary_join_element_wise(
                dup.column("text"), " dupmarkertoken", ""),
        })
        return pa.concat_tables([tbl.select(["url", "text"]), dup])

    def corpus():
        return ray.data.read_parquet(paths, columns=["url", "text"]) \
            .map_batches(inject_dups, batch_format="pyarrow")

    t0 = time.time()
    pairs = minhash_lsh_pairs(corpus(), id_column="url",
                              text_column="text",
                              threshold=0.5).materialize()
    queries["minhash_pairs_sec"] = round(time.time() - t0, 1)
    queries["minhash_pairs_rows"] = pairs.count()

    t0 = time.time()
    kept = near_dedup(corpus(), method="minhash", id_column="url",
                      text_column="text", threshold=0.5).materialize()
    queries["near_dedup_sec"] = round(time.time() - t0, 1)
    queries["near_dedup_kept"] = kept.count()
    queries["corpus_rows"] = CORPUS_ROWS
    # ~1/20 of non-empty rows duplicated (hash pick, so approximate)
    queries["input_rows_nominal"] = CORPUS_ROWS + CORPUS_ROWS // 20

    print(json.dumps({
        "metric": "web-scale dedup chain wall time",
        "value": queries["near_dedup_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": CORPUS_ROWS,
        "num_cpus": num_cpus,
    }))
    ray.shutdown()


def run_scale_ops(num_cpus: int, only: list[str] | None = None) -> None:
    """3M-row smokes for the round-4/5 heavy operators the sf0.1 suite
    can't stress: duplicate-span detection/removal FORCED onto the
    join path (max_broadcast_ngrams=0 — the 100-TB shape), sequence
    packing, the deterministic global shuffle, and tfidf/unigram with
    the model both broadcast (default) and FORCED sharded
    (broadcast_max_terms=0). Results recorded in BASELINE.md."""
    import ray
    import ray.data

    sys.path.insert(0, str(REPO))
    from patapsco_ray.functions import (
        duplicate_spans,
        pack_sequences,
        remove_duplicate_spans,
        shuffle_by_hash,
        tfidf_topk_terms,
        unigram_logprob,
    )

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False)
    paths = ensure_corpus()

    def corpus():
        return ray.data.read_parquet(paths, columns=["url", "text"])

    import pyarrow as pa
    import pyarrow.compute as pc

    def inject_dup_tail(tbl: pa.Table) -> pa.Table:
        # append a shared 60-token boilerplate tail to every 10th row
        # (hash pick) so 50-gram duplicate spans exist: the zipf-random
        # corpus has essentially none naturally
        import numpy as np

        from patapsco_ray.functions.hashing import stable_hash_strings

        urls = tbl.column("url").combine_chunks().cast(pa.string())
        pick = (stable_hash_strings(urls) % np.uint64(10) == 0) \
            & np.asarray(pc.not_equal(
                pc.fill_null(tbl.column("text"), ""), "")
                .to_numpy(zero_copy_only=False), dtype=bool)
        tail = " ".join(f"boiler{i:02d}" for i in range(60))
        suffix = pa.array([(" " + tail) if p else "" for p in pick],
                          pa.string())
        return pa.table({
            "url": urls,
            "text": pc.binary_join_element_wise(
                pc.fill_null(tbl.column("text"), ""), suffix, ""),
        })

    def span_corpus():
        return corpus().map_batches(inject_dup_tail,
                                    batch_format="pyarrow")

    jobs = {
        "duplicate_spans_join": lambda: duplicate_spans(
            span_corpus(), id_column="url", max_broadcast_ngrams=0),
        "remove_dup_spans_join": lambda: remove_duplicate_spans(
            span_corpus(), id_column="url", max_broadcast_ngrams=0),
        "pack_sequences": lambda: pack_sequences(
            corpus(), budget=1024, id_column="url"),
        "shuffle_by_hash": lambda: shuffle_by_hash(
            corpus(), key_column="url"),
        "tfidf_broadcast": lambda: tfidf_topk_terms(
            corpus(), id_column="url", k=5),
        "tfidf_sharded_model": lambda: tfidf_topk_terms(
            corpus(), id_column="url", k=5, broadcast_max_terms=0),
        "unigram_sharded_model": lambda: unigram_logprob(
            corpus(), id_column="url", broadcast_max_terms=0),
    }
    queries = {}
    for name, fn in jobs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            out = fn().materialize()
            queries[f"{name}_sec"] = round(time.time() - t0, 1)
            queries[f"{name}_rows"] = out.count()
            del out
        except Exception as e:  # record the boundary, keep going
            queries[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
        print(json.dumps({name: {k: v for k, v in queries.items()
                                 if k.startswith(name)}}), flush=True)
    print(json.dumps({
        "metric": "web-scale heavy-operator wall time",
        "value": sum(v for k, v in queries.items() if k.endswith("_sec")),
        "unit": "sec",
        "queries": queries,
        "sf": CORPUS_ROWS,
        "num_cpus": num_cpus,
    }))
    ray.shutdown()


def run_scale_positions(num_cpus: int) -> None:
    """Positional-index cost accounting at the 3M-row bench corpus:
    build the same index with positions=False (reference-parity
    DOCS_AND_FREQS) and positions=True, report build seconds, index
    bytes and the deltas. Best-of-N per variant, interleaved, so both
    variants sample the same box-noise windows. Results recorded in
    BASELINE.md (VERDICT r4 task 5)."""
    import ray

    sys.path.insert(0, str(REPO))
    from patapsco_ray.index import build_index
    from patapsco_ray.text import TextConfig

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False)
    paths = ensure_corpus()
    cfg = TextConfig(stem="porter")

    def du(d: str) -> int:
        return sum(p.stat().st_size
                   for p in pathlib.Path(d).rglob("*") if p.is_file())

    repeats = int(os.environ.get("BENCH_BUILD_REPEATS", "3"))
    best = {False: float("inf"), True: float("inf")}
    size = {}
    for _ in range(max(repeats, 1)):
        for pos in (False, True):
            d = f"/tmp/patapsco_bench_posidx_{int(pos)}"
            shutil.rmtree(d, ignore_errors=True)
            t0 = time.time()
            build_index(paths, d, text_config=cfg,
                        rows_per_segment=ROWS_PER_SEGMENT,
                        concurrency=num_cpus, positions=pos)
            best[pos] = min(best[pos], time.time() - t0)
            size[pos] = du(d)
    queries = {
        "build_sec_freqs": round(best[False], 1),
        "build_sec_positions": round(best[True], 1),
        "build_overhead_pct": round(
            100.0 * (best[True] / best[False] - 1.0), 1),
        "index_bytes_freqs": size[False],
        "index_bytes_positions": size[True],
        "size_overhead_pct": round(
            100.0 * (size[True] / size[False] - 1.0), 1),
        "corpus_rows": CORPUS_ROWS,
    }
    print(json.dumps({
        "metric": "positional-index build/size overhead",
        "value": queries["size_overhead_pct"],
        "unit": "pct",
        "queries": queries,
        "sf": CORPUS_ROWS,
        "num_cpus": num_cpus,
    }))
    ray.shutdown()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scale-dedup", action="store_true")
    ap.add_argument("--scale-ops", action="store_true")
    ap.add_argument("--scale-positions", action="store_true")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--headline-only", action="store_true")
    args = ap.parse_args()

    if args.scale_dedup:
        run_scale_dedup(
            args.cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32")))
        return

    if args.scale_ops:
        run_scale_ops(
            args.cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            only=args.only)
        return

    if args.scale_positions:
        run_scale_positions(
            args.cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32")))
        return

    if args.scaling:
        n = int(os.environ.get("SCALE_N", "2"))
        repeats = int(os.environ.get("SCALE_REPEATS", "3"))
        rows = int(os.environ.get("BENCH_CORPUS_ROWS", str(SCALING_ROWS)))
        levels = (n, 4 * n)
        results = {}
        # best-of-N with the two levels INTERLEAVED (lo,hi,lo,hi,...):
        # this box is shared and single runs can lose 2x throughput to
        # co-tenant load (observed 56k vs 131k docs/s for identical
        # 16-cpu runs minutes apart). Interleaving ensures both levels
        # sample the same noise windows; max over repeats is the
        # least-interference estimate of the engine's capability.
        for rep in range(repeats):
            for cpus in levels:
                proc = subprocess.run(
                    [sys.executable, str(REPO / "bench.py"),
                     "--headline-only", "--cpus", str(cpus)],
                    capture_output=True, text=True, timeout=3600,
                    env={**os.environ, "PYTHONPATH": str(REPO),
                         "BENCH_CORPUS_ROWS": str(rows),
                         # interleaved best-of-N across subprocesses IS
                         # the repeat protocol here; one build each
                         "BENCH_BUILD_REPEATS": "1"},
                )
                line = proc.stdout.strip().splitlines()[-1]
                r = json.loads(line)
                best = results.get(cpus)
                if best is None or (r["queries"]["docs_per_sec"]
                                    > best["queries"]["docs_per_sec"]):
                    results[cpus] = r
        thr_lo = results[levels[0]]["queries"]["docs_per_sec"]
        thr_hi = results[levels[1]]["queries"]["docs_per_sec"]
        eff = (thr_hi / thr_lo) / 4.0
        print(json.dumps({
            "metric": f"index-build scaling efficiency ({levels[0]} -> "
                      f"{levels[1]} cpus)",
            "value": round(eff, 4),
            "unit": "efficiency",
            "queries": {
                f"docs_per_sec_{levels[0]}cpu": round(thr_lo, 1),
                f"docs_per_sec_{levels[1]}cpu": round(thr_hi, 1),
                f"build_sec_{levels[0]}cpu":
                    round(results[levels[0]]["queries"]["build_sec"], 2),
                f"build_sec_{levels[1]}cpu":
                    round(results[levels[1]]["queries"]["build_sec"], 2),
                f"finalize_sec_{levels[0]}cpu":
                    results[levels[0]]["queries"].get("finalize_sec", 0.0),
                f"finalize_sec_{levels[1]}cpu":
                    results[levels[1]]["queries"].get("finalize_sec", 0.0),
            },
            "sf": rows,
            "num_cpus": levels[1],
        }))
        return

    num_cpus = args.cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False)

    t_all = time.time()
    head = run_headline(num_cpus, f"/tmp/patapsco_bench_index_{num_cpus}")
    queries = {
        "index_build": round(head["build_sec"], 3),
        "build_sec": round(head["build_sec"], 3),
        "docs_per_sec": round(head["docs_per_sec"], 1),
        "finalize_sec": round(head["finalize_sec"], 3),
        "search_topk": round(head["search_sec"], 3),
    }
    if not args.headline_only:
        queries.update(run_sf_ops(sf_dir))
    total = time.time() - t_all
    print(json.dumps({
        "metric": "index-build + BM25 search + training-data ops wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
