"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in patapsco_ray) calls ``ray.init()`` / ``ray.shutdown()``.

Flagship pipeline: Common-Crawl-style docs -> text chain -> inverted
index (segment build + global-term merge) -> BM25/QLD top-k, the north
rule of BASELINE.json. The SQL oracles replicate Lucene-faithful BM25 /
QLD scoring (exact-doc-length mode) in ANSI SQL so rankings AND scores
are value-checked, not just row counts.
"""

from __future__ import annotations

import pathlib
import re
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from patapsco_ray.functions import (
    connected_components,
    cosine_neardup_pairs,
    cosine_topk,
    exact_duplicates,
    fingerprints,
    near_dedup,
    language_id,
    lsh_cosine_topk,
    ivf_cosine_topk,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    quality_signals,
    simhash_pairs,
    token_counts,
)
from patapsco_ray.functions import (
    sessionize,
    topk_by_key,
    tumbling_window_agg,
)
from patapsco_ray.functions.multimodal import (
    decode_images,
    extract_audio_features,
    sample_video_frames,
)
from patapsco_ray.index import build_index
from patapsco_ray.search import IndexSearcher
from patapsco_ray.stages import DocStore, process_documents, write_doc_store
from patapsco_ray.text import TextConfig
from patapsco_ray.text.stopwords import load_stopwords

# ----------------------------------------------------------------- setup

# SQL-friendly text config: whitespace tokenize + lowercase, no
# stopword removal / stemming, so the DuckDB oracle can reproduce the
# token stream with string_split(lower(text), ' ').
SQL_TEXT_CONFIG = TextConfig(stopwords=False, stem=False, lowercase=True)

# Fixed retrieval queries over the synthetic documents vocabulary
# (terms all occur in /root/testdata/sf*/documents.parquet). Distinct
# terms per query => qtf == 1 everywhere.
RETRIEVAL_QUERIES: list[tuple[str, str]] = [
    ("q1", "join hash scan"),
    ("q2", "window agg stream"),
    ("q3", "vector batch spark"),
    ("q4", "customer order part"),
    ("q5", "filter merge slow fast"),
    ("q6", "data table column row"),
]
TOP_K = 10  # north rule: BM25 top-10 rank identity

# fixed PSQ clauses (weighted translation alternatives) over the same
# vocabulary; scored with projected tf/df BM25 (search/psq.py)
PSQ_CLAUSES: list[list[tuple[str, float]]] = [
    [("join", 0.7), ("merge", 0.3)],
    [("hash", 0.8), ("scan", 0.2)],
    [("window", 1.0)],
]

# Fixed RM3-expanded query models: the output of
# patapsco_ray.search.rm3.rm3_expand (fb_docs=10, fb_terms=10,
# original_query_weight=0.5) for RETRIEVAL_QUERIES over the sf0.01
# documents index/store, frozen here so BOTH the Ray engine and the
# DuckDB oracle score the SAME weighted queries — this hash-checks the
# weighted-BM25 scoring of expanded queries end-to-end (the expansion
# derivation itself stays rows-only via rm3_topk).
RM3_EXPANDED_QUERIES: dict[str, list[tuple[str, float]]] = {
    "q1": [("a", 0.040471211995410934), ("fast", 0.04159158181820795),
           ("hash", 0.2365341790596697), ("join", 0.23702967259696722),
           ("line", 0.0405732916612102), ("merge", 0.039146067653112175),
           ("order", 0.04017433611063104), ("scan", 0.24232527061959494),
           ("slow", 0.03958293707663205), ("vector", 0.042571451408563776)],
    "q2": [("a", 0.04135068374219488), ("agg", 0.2354793067188704),
           ("batch", 0.04022881719905773), ("hash", 0.04016769728167509),
           ("merge", 0.0429073778593336), ("row", 0.04052631927434634),
           ("scan", 0.04529725996363589), ("small", 0.04569458440490882),
           ("stream", 0.23324061333590745), ("window", 0.23510734022006974)],
    "q3": [("batch", 0.22727025328351352), ("column", 0.04065292905676713),
           ("data", 0.04151558365831449), ("fast", 0.047308813626739374),
           ("key", 0.039951340012635915), ("line", 0.047648288176814144),
           ("slow", 0.04098190616482406), ("spark", 0.23415324852632283),
           ("stream", 0.045821424935952225), ("vector", 0.2346962125581163)],
    "q4": [("column", 0.04445734203675184), ("customer", 0.22526789046850573),
           ("filter", 0.04258207185588275), ("order", 0.23493678751737523),
           ("part", 0.23802394487986248), ("scan", 0.043091617286165146),
           ("slow", 0.03960263195685583), ("spark", 0.0413203258146937),
           ("the", 0.044306897357098605), ("window", 0.046410490826808655)],
    "q5": [("agg", 0.03591172993961116), ("batch", 0.038517171554791646),
           ("column", 0.04118161820911211), ("fast", 0.19038082683307284),
           ("filter", 0.18684136549296637), ("join", 0.040340574322715234),
           ("merge", 0.18721717515190772), ("slow", 0.1873458681653528),
           ("spark", 0.05700447357068021), ("table", 0.03525919675978991)],
    "q6": [("column", 0.19511979644741467), ("data", 0.18379196601450679),
           ("fast", 0.04118041644431046), ("filter", 0.04056827101616324),
           ("key", 0.043398484294756914), ("part", 0.0434044210987107),
           ("query", 0.04349503418382157), ("row", 0.1882256348984416),
           ("table", 0.17556635405993312), ("value", 0.0452496215419409)],
}

_CACHE_ROOT = pathlib.Path("/tmp/patapsco_ray_cache")


def _index_for(sf_dir: str) -> str:
    """Build (or reuse, via segment-lineage resume) the documents index
    for one scale factor; returns the index dir."""
    key = re.sub(r"[^A-Za-z0-9._-]", "_", str(sf_dir).strip("/"))
    index_dir = _CACHE_ROOT / f"{key}-docs-v1"
    build_index(
        f"{sf_dir}/documents.parquet",
        index_dir,
        text_config=SQL_TEXT_CONFIG,
        id_column="doc_id",
        text_column="text",
        html_column=None,
        rows_per_segment=200,  # force multi-segment merge at sf0.01
    )
    return str(index_dir)


def _scaled(x) -> pa.Array:
    return pa.array(
        np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5).astype(np.int64)
    )


def _rank_rounded(tbl: pa.Table, k: int) -> pa.Table:
    """Re-rank by (rounded score desc, doc_id asc) and cut to k per
    query. The engine ranks by exact float score (Lucene semantics);
    the SQL oracle's floats can differ in the last ulp (different
    summation order), which flips near-ties. Ranking BOTH sides on the
    1e6-rounded score makes the comparison deterministic; extra rows
    beyond k are fetched so rounded ties at the boundary resolve the
    same way on both sides."""
    import pandas as pd

    df = pd.DataFrame({
        "query_id": tbl.column("query_id").to_pylist(),
        "doc_id": [int(d) for d in tbl.column("doc_id").to_pylist()],
        "score_1e6": np.floor(
            np.asarray(tbl.column("score").to_pylist()) * 1e6 + 0.5
        ).astype(np.int64),
    })
    df = df.sort_values(["query_id", "score_1e6", "doc_id"],
                        ascending=[True, False, True])
    df["rank"] = df.groupby("query_id").cumcount()
    df = df[df["rank"] < k]
    return pa.table({
        "query_id": pa.array(df["query_id"], pa.string()),
        "doc_id": pa.array(df["doc_id"], pa.int64()),
        "rank": pa.array(df["rank"], pa.int64()),
        "score_1e6": pa.array(df["score_1e6"], pa.int64()),
    })


def _search(sf_dir: str, scorer: str, quantize: bool = False) -> pa.Table:
    searcher = IndexSearcher(
        _index_for(sf_dir), scorer=scorer, quantize_norms=quantize
    )
    tbl = searcher.search_batch(RETRIEVAL_QUERIES, k=TOP_K + 16)
    return _rank_rounded(tbl, TOP_K)


def _read_clean(path: str) -> ray.data.Dataset:
    """read_parquet with the file's pandas metadata stripped: Ray's
    block-schema dedup can't hash dict-valued schema metadata and logs
    'Failed to hash the schemas' warnings per read task otherwise."""
    schema = pq.read_schema(path).remove_metadata()
    return ray.data.read_parquet(path, schema=schema)


def _docs(sf_dir: str) -> ray.data.Dataset:
    return _read_clean(f"{sf_dir}/documents.parquet")


def _emb(sf_dir: str) -> ray.data.Dataset:
    return _read_clean(f"{sf_dir}/embeddings.parquet")


def _query_vectors(sf_dir: str, n: int) -> np.ndarray:
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )
    col = t.column("embedding").combine_chunks()
    dim = len(col[0])
    flat = np.asarray(col.flatten().to_numpy(zero_copy_only=False))
    return flat.reshape(-1, dim)[:n]


# ------------------------------------------------------------ entrypoints


def entry() -> Any:
    """Flagship: sf0.001 documents -> segment index build -> global term
    merge -> BM25 top-k for the fixed query set."""
    return _search("/root/testdata/sf0.001", "bm25")


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {}

    # --- index build + retrieval (the reference's core pipeline) ---
    q["bm25_topk"] = lambda sf: _search(sf, "bm25")
    q["qld_topk"] = lambda sf: _search(sf, "qld")

    def psq(sf: str):
        searcher = IndexSearcher(_index_for(sf), quantize_norms=False)
        hits = searcher.search_psq(PSQ_CLAUSES, k=TOP_K + 16)
        tbl = pa.table({
            "query_id": pa.array(["p"] * len(hits), pa.string()),
            "doc_id": pa.array([h["doc_id"] for h in hits], pa.string()),
            "score": pa.array([h["score"] for h in hits], pa.float64()),
        })
        return _rank_rounded(tbl, TOP_K).drop_columns(["query_id"])

    q["psq_topk"] = psq

    # the DEFAULT scoring path: byte4-quantized doc lengths (Lucene
    # SmallFloat norms); oracle embeds the quantization table as VALUES
    q["bm25_topk_quantized"] = lambda sf: _search(sf, "bm25", quantize=True)

    def rm3(sf: str):  # rows-only: feedback weights not SQL-friendly
        idx = _index_for(sf)
        store_dir = _CACHE_ROOT / (
            re.sub(r"[^A-Za-z0-9._-]", "_", str(sf).strip("/")) + "-store-v1"
        )
        if not (store_dir / ".complete").exists():
            proc = process_documents(
                _docs(sf), text_config=SQL_TEXT_CONFIG,
                id_column="doc_id", html_column=None,
            )
            write_doc_store(proc, store_dir, num_buckets=8)
            (store_dir / ".complete").touch()
        from patapsco_ray.search import search_rm3

        searcher = IndexSearcher(idx)
        store = DocStore(store_dir)
        rows = []
        for qid, text in RETRIEVAL_QUERIES:
            for hit in search_rm3(searcher, store, text, k=TOP_K):
                rows.append((qid, hit["doc_id"], hit["rank"], hit["score"]))
        return pa.table({
            "query_id": pa.array([r[0] for r in rows], pa.string()),
            "doc_id": pa.array([int(r[1]) for r in rows], pa.int64()),
            "rank": pa.array([r[2] for r in rows], pa.int64()),
            "score_1e6": _scaled([r[3] for r in rows]),
        })

    q["rm3_topk"] = rm3

    def rm3_weighted(sf: str):
        # score the FROZEN expanded query models (see
        # RM3_EXPANDED_QUERIES provenance) — weighted BM25 over exact
        # doc lengths, hash-checked against the SQL oracle
        searcher = IndexSearcher(_index_for(sf), quantize_norms=False)
        qids, dids, scores = [], [], []
        for qid, pairs in sorted(RM3_EXPANDED_QUERIES.items()):
            for hit in searcher.search_weighted(dict(pairs), k=TOP_K + 16):
                qids.append(qid)
                dids.append(hit["doc_id"])
                scores.append(hit["score"])
        tbl = pa.table({
            "query_id": pa.array(qids, pa.string()),
            "doc_id": pa.array(dids, pa.string()),
            "score": pa.array(scores, pa.float64()),
        })
        return _rank_rounded(tbl, TOP_K)

    q["rm3_weighted_topk"] = rm3_weighted

    def processed_counts(sf: str):
        # full DocumentProcessor chain (stopword removal on) -> token
        # counts; SQL oracle replicates tokenize+lower+stopword-filter
        proc = process_documents(
            _docs(sf), text_config=TextConfig(stopwords="lucene",
                                              stem=False, lowercase=True),
            id_column="doc_id", html_column=None,
        )

        def count(t: pa.Table) -> pa.Table:
            texts = t.column("text").to_pylist()
            return pa.table({
                "doc_id": pa.compute.cast(t.column("doc_id"), pa.int64()),
                "n_tokens_processed": pa.array(
                    [len(x.split()) for x in texts], pa.int64()),
            })

        return proc.map_batches(count, batch_format="pyarrow")

    q["processed_token_counts"] = processed_counts

    def term_stats(sf: str):
        idx = _index_for(sf)
        return ray.data.read_parquet(f"{idx}/global_terms")

    q["index_term_stats"] = term_stats

    def doc_lengths(sf: str):
        idx = _index_for(sf)
        import glob

        files = sorted(glob.glob(f"{idx}/seg=*/docs.parquet"))
        ds = ray.data.read_parquet(files, columns=["doc_id", "dl"])
        return ds.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pa.compute.cast(t.column("doc_id"), pa.int64()),
                    "dl": pa.compute.cast(t.column("dl"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    q["index_doc_lengths"] = doc_lengths

    # --- text analysis ---
    q["token_counts"] = lambda sf: token_counts(_docs(sf))
    q["quality_signals"] = lambda sf: quality_signals(_docs(sf)).select_columns(
        ["doc_id", "n_chars", "n_tokens", "n_unique_tokens", "n_stopwords"]
    )
    q["language_id"] = lambda sf: language_id(_docs(sf))  # rows-only
    q["fingerprints"] = lambda sf: fingerprints(_docs(sf))  # rows-only

    def norm_report(sf: str):  # rows-only: difflib opcodes not in SQL
        from patapsco_ray.text.normalize import normalization_report

        return normalization_report(_docs(sf), text_column="text")

    q["normalization_report"] = norm_report

    # --- deduplication ---
    q["exact_duplicates"] = lambda sf: exact_duplicates(_docs(sf))
    q["ngram_jaccard_pairs"] = lambda sf: ngram_jaccard_pairs(
        _docs(sf), threshold=0.2
    )
    q["minhash_lsh_pairs"] = lambda sf: minhash_lsh_pairs(
        _docs(sf), threshold=0.5
    )  # rows-only (probabilistic)
    # cluster-level dedup: transitive closure of the jaccard pairs
    # (driver union-find at this edge count; alternating-star Ray
    # rounds above 5M edges — tests/test_cluster.py covers both)
    q["dedup_clusters"] = lambda sf: connected_components(
        ngram_jaccard_pairs(_docs(sf), threshold=0.2))
    q["dedup_keep"] = lambda sf: near_dedup(
        _docs(sf), method="jaccard", threshold=0.2
    ).select_columns(["doc_id"])
    q["exact_dedup_keep"] = lambda sf: near_dedup(
        _docs(sf), method="exact").select_columns(["doc_id"])
    q["simhash_pairs"] = lambda sf: simhash_pairs(
        _docs(sf), max_hamming=3
    )  # rows-only

    # --- similarity search over embeddings ---
    def topk(sf: str):
        Q = _query_vectors(sf, 3)
        return cosine_topk(
            _emb(sf).filter(expr="vec_id >= 3"),
            Q,
            query_ids=["q0", "q1", "q2"],
            k=5,
        )

    q["cosine_topk"] = topk
    q["cosine_neardup_pairs"] = lambda sf: cosine_neardup_pairs(
        _emb(sf), threshold=0.4
    )

    def lsh_topk(sf: str):
        Q = _query_vectors(sf, 2)
        return lsh_cosine_topk(
            _emb(sf), Q, query_ids=["q0", "q1"], k=5, planes=6
        )

    q["lsh_cosine_topk"] = lsh_topk  # rows-only (approximate)

    def ivf_topk(sf: str):
        Q = _query_vectors(sf, 2)
        return ivf_cosine_topk(
            _emb(sf), Q, query_ids=["q0", "q1"], k=5,
            ncentroids=16, nprobe=6,
        )

    q["ivf_cosine_topk"] = ivf_topk  # rows-only (approximate)

    def ivf_topk_fullprobe(sf: str):
        # nprobe == ncentroids probes every cell: the IVF machinery
        # (train, assign, mask, per-cell score, merge) must reproduce
        # the exact brute-force result — value-checked against SQL
        Q = _query_vectors(sf, 2)
        return ivf_cosine_topk(
            _emb(sf), Q, query_ids=["q0", "q1"], k=5,
            ncentroids=16, nprobe=16,
        )

    q["ivf_cosine_topk_fullprobe"] = ivf_topk_fullprobe

    def qfilter(sf: str):
        from patapsco_ray.functions import quality_filter

        return quality_filter(_docs(sf), min_tokens=20,
                              max_stopword_ratio=0.5, min_unique_ratio=0.3)

    q["quality_filter"] = qfilter

    def url_dedup(sf: str):
        from patapsco_ray.functions import url_duplicates

        def add_url(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_pylist()
            urls = [
                f"https://Ex.org/p/{i % 50}/?utm_source=x&id={i % 7}"
                for i in ids
            ]
            return pa.table({"url": pa.array(urls, pa.string()),
                             "doc_id": t.column("doc_id")})

        ds = _docs(sf).map_batches(add_url, batch_format="pyarrow")
        return url_duplicates(ds)

    q["url_duplicates"] = url_dedup

    # --- event-stream operators (windowed/sessionized aggregates) ---
    def _events(sf: str):
        return _read_clean(f"{sf}/events.parquet")

    q["window_agg"] = lambda sf: tumbling_window_agg(_events(sf),
                                                     window="1h")

    def sliding(sf: str):
        from patapsco_ray.functions import sliding_window_agg

        return sliding_window_agg(_events(sf), window="1h", slide="30m")

    q["sliding_window_agg"] = sliding
    q["sessionize"] = lambda sf: sessionize(_events(sf), gap="30m")
    q["topk_by_key"] = lambda sf: topk_by_key(_events(sf), k=3)

    # --- multimodal plumbing (deterministic fake decode backend) ---
    def _with_binary(sf: str, col: str) -> ray.data.Dataset:
        def add(t: pa.Table) -> pa.Table:
            payload = pa.compute.cast(
                t.column("text"), pa.binary()
            )
            return pa.table({"id": t.column("doc_id"), col: payload})

        return _docs(sf).map_batches(add, batch_format="pyarrow")

    q["decode_images"] = lambda sf: decode_images(
        _with_binary(sf, "image"), concurrency=2
    )  # rows-only
    q["audio_features"] = lambda sf: extract_audio_features(
        _with_binary(sf, "audio"), concurrency=2
    )  # rows-only
    q["video_frames"] = lambda sf: sample_video_frames(
        _with_binary(sf, "video"), every_n=10
    )  # rows-only

    return q


# ------------------------------------------------------------ oracles


def _queries_values() -> str:
    rows = []
    for qid, text in RETRIEVAL_QUERIES:
        for term in text.split():
            rows.append(f"('{qid}', '{term}')")
    return ", ".join(rows)


_TOKS = (
    "SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), "
    "x -> x <> '')) AS term FROM documents"
)

_RETRIEVAL_BASE = f"""
WITH q(query_id, term) AS (VALUES {{values}}),
toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
       FROM toks GROUP BY doc_id, term),
dl AS (SELECT d.doc_id, count(t.term)::DOUBLE AS dl
       FROM documents d LEFT JOIN toks t USING (doc_id)
       GROUP BY d.doc_id),
stats AS (SELECT count(*)::DOUBLE AS n,
                 (SELECT sum(dl) FROM dl) / count(*)::DOUBLE AS avgdl,
                 (SELECT sum(dl) FROM dl) AS total_tf
          FROM documents),
df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df, count(*)::DOUBLE AS cf
       FROM toks GROUP BY term),
scored AS (
  SELECT q.query_id, tf.doc_id, sum({{term_score}}) AS score
  FROM q JOIN tf ON tf.term = q.term
         JOIN df ON df.term = q.term
         JOIN dl ON dl.doc_id = tf.doc_id
         CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id)
SELECT query_id, doc_id,
  CAST(row_number() OVER (PARTITION BY query_id
       ORDER BY score_1e6 DESC, doc_id) - 1 AS BIGINT) AS rank,
  score_1e6
FROM (SELECT query_id, doc_id,
        CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT) AS score_1e6
      FROM scored)
QUALIFY rank < {TOP_K} ORDER BY query_id, rank
"""

# Lucene>=8 BM25, exact doc lengths (engine mode quantize_norms=False):
# idf = ln(1+(N-df+0.5)/(df+0.5)); w = tf/(tf + k1*(1-b+b*dl/avgdl))
_BM25_TERM = (
    "ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) "
    "* tf.tf / (tf.tf + 0.9 * (1 - 0.4 + 0.4 * dl.dl / s.avgdl))"
)
# LMDirichlet (mu=1000), per-term clamp at 0 like Lucene's non-negative
# score requirement:
_QLD_TERM = (
    "GREATEST(ln(1 + tf.tf / (1000.0 * df.cf / s.total_tf)) "
    "+ ln(1000.0 / (dl.dl + 1000.0)), 0.0)"
)


def _rm3_weighted_values() -> str:
    rows = []
    for qid, pairs in sorted(RM3_EXPANDED_QUERIES.items()):
        for term, w in pairs:
            rows.append(f"('{qid}', '{term}', {w!r})")
    return ", ".join(rows)


def _psq_values() -> str:
    rows = []
    for ci, clause in enumerate(PSQ_CLAUSES):
        for term, prob in clause:
            rows.append(f"({ci}, '{term}', {prob})")
    return ", ".join(rows)


_PSQ_SQL = f"""
WITH c(clause_id, term, prob) AS (VALUES {{values}}),
toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
       FROM toks GROUP BY doc_id, term),
dl AS (SELECT d.doc_id, count(t.term)::DOUBLE AS dl
       FROM documents d LEFT JOIN toks t USING (doc_id)
       GROUP BY d.doc_id),
stats AS (SELECT count(*)::DOUBLE AS n,
                 (SELECT sum(dl) FROM dl) / count(*)::DOUBLE AS avgdl
          FROM documents),
df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
       FROM toks GROUP BY term),
proj AS (SELECT c.clause_id, tf.doc_id, sum(c.prob * tf.tf) AS tfp
         FROM c JOIN tf ON tf.term = c.term GROUP BY 1, 2),
dfp AS (SELECT c.clause_id, sum(c.prob * df.df) AS dfp
        FROM c JOIN df ON df.term = c.term GROUP BY 1),
scored AS (
  SELECT p.doc_id,
    sum(ln(1 + (s.n - dfp.dfp + 0.5) / (dfp.dfp + 0.5))
        * p.tfp / (p.tfp + 0.9 * (1 - 0.4 + 0.4 * dl.dl / s.avgdl)))
      AS score
  FROM proj p JOIN dfp USING (clause_id)
       JOIN dl ON dl.doc_id = p.doc_id
       CROSS JOIN stats s
  GROUP BY p.doc_id)
SELECT doc_id,
  CAST(row_number() OVER (ORDER BY score_1e6 DESC, doc_id) - 1 AS BIGINT)
    AS rank,
  score_1e6
FROM (SELECT doc_id, CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT)
        AS score_1e6 FROM scored)
QUALIFY rank < {TOP_K} ORDER BY rank
"""


def _quantized_bm25_sql() -> str:
    """BM25 over byte4-QUANTIZED doc lengths (the engine's default,
    Lucene SmallFloat norm semantics): the dl -> quantized-dl mapping
    is a fixed public table, embedded as VALUES."""
    from patapsco_ray.index.norms import DECODE_TABLE, encode_lengths

    dls = np.arange(4096, dtype=np.int64)
    dlq = DECODE_TABLE[encode_lengths(dls)]
    pairs = ", ".join(f"({int(d)}, {float(q)})" for d, q in zip(dls, dlq))
    return f"""
WITH q(query_id, term) AS (VALUES {_queries_values()}),
toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
       FROM toks GROUP BY doc_id, term),
dl AS (SELECT d.doc_id, count(t.term) AS dl
       FROM documents d LEFT JOIN toks t USING (doc_id)
       GROUP BY d.doc_id),
qmap(dl, dlq) AS (VALUES {pairs}),
dlq AS (SELECT dl.doc_id, qmap.dlq FROM dl JOIN qmap USING (dl)),
stats AS (SELECT count(*)::DOUBLE AS n,
                 (SELECT sum(dl) FROM dl) / count(*)::DOUBLE AS avgdl
          FROM documents),
df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
       FROM toks GROUP BY term),
scored AS (
  SELECT q.query_id, tf.doc_id,
    sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
        * tf.tf / (tf.tf + 0.9 * (1 - 0.4 + 0.4 * dlq.dlq / s.avgdl)))
      AS score
  FROM q JOIN tf ON tf.term = q.term
         JOIN df ON df.term = q.term
         JOIN dlq ON dlq.doc_id = tf.doc_id
         CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id)
SELECT query_id, doc_id,
  CAST(row_number() OVER (PARTITION BY query_id
       ORDER BY score_1e6 DESC, doc_id) - 1 AS BIGINT) AS rank,
  score_1e6
FROM (SELECT query_id, doc_id,
        CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT) AS score_1e6
      FROM scored)
QUALIFY rank < {TOP_K} ORDER BY query_id, rank
"""


def _language_id_sql() -> str:
    """Stopword-voting language id: per-language profile word lists
    embedded as VALUES; argmax hits with lexicographic tie-break,
    'und' on zero hits."""
    from patapsco_ray.functions.textstats import langid_profiles

    profiles = langid_profiles()
    rows = ", ".join(
        "('{}', '{}')".format(lang, w.replace("'", "''"))
        for lang in sorted(profiles) for w in profiles[lang]
    )
    return f"""
WITH toks AS ({_TOKS}),
prof(lang, w) AS (VALUES {rows}),
hits AS (
  SELECT t.doc_id, p.lang, count(*) AS n
  FROM toks t JOIN prof p ON t.term = p.w
  GROUP BY 1, 2),
best AS (
  SELECT doc_id, lang, n,
    row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, lang) AS rn
  FROM hits)
SELECT d.doc_id,
  coalesce(b.lang, 'und') AS pred_lang,
  CAST(coalesce(b.n, 0) AS BIGINT) AS n_hits
FROM documents d
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
"""


def oracle_sql() -> dict[str, str]:
    sw_list = ", ".join(
        f"'{w}'" for w in sorted(load_stopwords("lucene", "eng"))
    )
    # shared CTE chain: jaccard>=0.2 pairs (same plan as the
    # ngram_jaccard_pairs oracle) -> undirected edges -> transitive
    # closure (recursive CTE) -> component root = min reachable id
    jaccard_comp_ctes = """
            toks AS (
              SELECT doc_id,
                list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
              FROM documents),
            shl AS (
              SELECT doc_id, CASE WHEN len(t) < 3
                THEN [array_to_string(t, ' ')]
                ELSE list_transform(range(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END AS shs
              FROM toks WHERE len(t) > 0),
            sh AS (SELECT DISTINCT doc_id, unnest(shs) AS sh FROM shl),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            p0 AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
              FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            jp AS (
              SELECT id_a, id_b FROM p0
              JOIN sizes na ON p0.id_a = na.doc_id
              JOIN sizes nb ON p0.id_b = nb.doc_id
              WHERE n_common * 1.0 / (na.n + nb.n - n_common) >= 0.2),
            edges AS (SELECT id_a AS u, id_b AS v FROM jp
                      UNION SELECT id_b, id_a FROM jp),
            reach AS (
              SELECT u AS id, v AS r FROM edges
              UNION
              SELECT reach.id, e.v FROM reach JOIN edges e
                ON reach.r = e.u),
            comp AS (SELECT id, LEAST(id, MIN(r)) AS root
                     FROM reach GROUP BY id)"""
    return {
        "dedup_clusters": f"""
            WITH RECURSIVE {jaccard_comp_ctes}
            SELECT id, root FROM comp""",
        "dedup_keep": f"""
            WITH RECURSIVE {jaccard_comp_ctes}
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> root)""",
        "exact_dedup_keep": """
            SELECT doc_id FROM (
              SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS k
              FROM documents) WHERE doc_id = k""",
        "bm25_topk": _RETRIEVAL_BASE.format(
            values=_queries_values(), term_score=_BM25_TERM
        ),
        "qld_topk": _RETRIEVAL_BASE.format(
            values=_queries_values(), term_score=_QLD_TERM
        ),
        "psq_topk": _PSQ_SQL.format(values=_psq_values()),
        # weighted BM25 over the frozen RM3 expansions: score =
        # sum_t w_t * idf(t) * tf/(tf+denom) with exact doc lengths
        "rm3_weighted_topk": _RETRIEVAL_BASE.replace(
            "q(query_id, term)", "q(query_id, term, w)"
        ).format(
            values=_rm3_weighted_values(),
            term_score=f"q.w * ({_BM25_TERM})",
        ),
        "bm25_topk_quantized": _quantized_bm25_sql(),
        "processed_token_counts": f"""
            WITH toks AS ({_TOKS})
            SELECT d.doc_id,
              count(CASE WHEN t.term NOT IN ({sw_list}) THEN 1 END)
                AS n_tokens_processed
            FROM documents d LEFT JOIN toks t USING (doc_id)
            GROUP BY d.doc_id""",
        "index_term_stats": f"""
            WITH toks AS ({_TOKS})
            SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
            FROM toks GROUP BY term""",
        "index_doc_lengths": f"""
            WITH toks AS ({_TOKS})
            SELECT d.doc_id, count(t.term) AS dl
            FROM documents d LEFT JOIN toks t USING (doc_id)
            GROUP BY d.doc_id""",
        "token_counts": r"""
            SELECT doc_id,
              len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                AS n_tokens,
              len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                AS n_tokens_bpe
            FROM documents""",
        "quality_signals": f"""
            WITH toks AS ({_TOKS})
            SELECT d.doc_id, length(d.text) AS n_chars,
              count(t.term) AS n_tokens,
              count(DISTINCT t.term) AS n_unique_tokens,
              count(CASE WHEN t.term IN ({sw_list}) THEN 1 END) AS n_stopwords
            FROM documents d LEFT JOIN toks t USING (doc_id)
            GROUP BY d.doc_id, d.text""",
        "exact_duplicates": """
            SELECT min(doc_id) AS keep_id, count(*) AS n_copies
            FROM documents GROUP BY text""",
        "quality_filter": f"""
            WITH toks AS ({_TOKS}),
            sig AS (
              SELECT d.doc_id, count(t.term) AS n_tokens,
                count(DISTINCT t.term) AS nu,
                count(CASE WHEN t.term IN ({sw_list}) THEN 1 END) AS nsw
              FROM documents d LEFT JOIN toks t USING (doc_id)
              GROUP BY d.doc_id)
            SELECT doc_id, n_tokens FROM sig
            WHERE n_tokens >= 20 AND nsw*1.0/n_tokens <= 0.5
              AND nu*1.0/n_tokens >= 0.3""",
        "url_duplicates": """
            SELECT min(doc_id) AS keep_id, count(*) AS n_copies
            FROM documents GROUP BY doc_id % 50, doc_id % 7""",
        "language_id": _language_id_sql(),
        "window_agg": """
            SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
              event_type, count(*) AS n_events,
              CAST(FLOOR(sum(value)*1000000 + 0.5) AS BIGINT)
                AS sum_value_1e6,
              CAST(FLOOR(min(value)*1000000 + 0.5) AS BIGINT)
                AS min_value_1e6,
              CAST(FLOOR(max(value)*1000000 + 0.5) AS BIGINT)
                AS max_value_1e6
            FROM events GROUP BY 1, 2""",
        "sliding_window_agg": """
            WITH h AS (SELECT unnest(range(0, 2)) AS j),
            w AS (SELECT e.event_type, e.value, e.ts,
                   time_bucket(INTERVAL 30 MINUTE, e.ts)
                     - to_minutes(30 * j::INT) AS window_start
                  FROM events e CROSS JOIN h)
            SELECT window_start, event_type, count(*) AS n_events,
              CAST(FLOOR(sum(value)*1000000 + 0.5) AS BIGINT)
                AS sum_value_1e6
            FROM w WHERE window_start + INTERVAL 1 HOUR > ts
            GROUP BY 1, 2""",
        "sessionize": """
            WITH o AS (
              SELECT user_id, ts,
                CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                     ORDER BY ts) > INTERVAL 30 MINUTE OR
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       IS NULL
                THEN 1 ELSE 0 END AS new_s
              FROM events),
            s AS (SELECT user_id, ts,
                  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) - 1
                    AS sid
                  FROM o)
            SELECT user_id, CAST(sid AS BIGINT) AS session_id,
                   count(*) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM s GROUP BY 1, 2""",
        "topk_by_key": """
            SELECT event_type, event_id,
              CAST(row_number() OVER (PARTITION BY event_type
                   ORDER BY value DESC, event_id) - 1 AS BIGINT) AS rank,
              CAST(FLOOR(value*1000000 + 0.5) AS BIGINT) AS value_1e6
            FROM events QUALIFY rank < 3""",
        "ngram_jaccard_pairs": f"""
            WITH toks AS (
              SELECT doc_id,
                list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
              FROM documents),
            shl AS (
              SELECT doc_id, CASE WHEN len(t) < 3
                THEN [array_to_string(t, ' ')]
                ELSE list_transform(range(1, len(t) - 1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END AS shs
              FROM toks WHERE len(t) > 0),
            sh AS (SELECT DISTINCT doc_id, unnest(shs) AS sh FROM shl),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
              FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b, n_common, na.n AS n_a, nb.n AS n_b,
              CAST(FLOOR(n_common * 1.0 / (na.n + nb.n - n_common) * 1000000
                   + 0.5) AS BIGINT) AS jaccard_1e6
            FROM pairs JOIN sizes na ON pairs.id_a = na.doc_id
                       JOIN sizes nb ON pairs.id_b = nb.doc_id
            WHERE n_common * 1.0 / (na.n + nb.n - n_common) >= 0.2""",
        "cosine_topk": """
            WITH q AS (SELECT 'q' || CAST(vec_id AS VARCHAR) AS query_id,
                  embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 3),
            c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
                  WHERE vec_id >= 3),
            s AS (SELECT query_id, vec_id,
                  CAST(FLOOR(list_cosine_similarity(qe, e) * 1000000 + 0.5)
                       AS BIGINT) AS score_1e6 FROM q CROSS JOIN c)
            SELECT query_id, vec_id, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY score_1e6 DESC, vec_id) - 1
                AS BIGINT) AS rank, score_1e6
            FROM s QUALIFY rank < 5""",
        "ivf_cosine_topk_fullprobe": """
            WITH q AS (SELECT 'q' || CAST(vec_id AS VARCHAR) AS query_id,
                  embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 2),
            c AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
            s AS (SELECT query_id, vec_id,
                  CAST(FLOOR(list_cosine_similarity(qe, e) * 1000000 + 0.5)
                       AS BIGINT) AS score_1e6 FROM q CROSS JOIN c)
            SELECT query_id, vec_id, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY score_1e6 DESC, vec_id) - 1
                AS BIGINT) AS rank, score_1e6
            FROM s QUALIFY rank < 5""",
        "cosine_neardup_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              CAST(FLOOR(list_cosine_similarity(a.embedding::DOUBLE[],
                   b.embedding::DOUBLE[]) * 1000000 + 0.5) AS BIGINT)
                AS score_1e6
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                  b.embedding::DOUBLE[]) >= 0.4""",
    }
