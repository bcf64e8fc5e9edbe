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
from patapsco_ray.functions import repetition_signals, winnow_fingerprints
from patapsco_ray.functions.multimodal import (
    decode_images,
    extract_audio_features,
    png_encode,
    sample_video_frames,
    video_container_encode,
    wav_encode,
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

# Fixed Lucene-syntax boolean queries (boosts, MUST, MUST_NOT) with
# their parsed clause tables — kept literally in sync so the SQL
# oracle replays the same BooleanQuery semantics
LUCENE_QUERIES: list[tuple[str, str]] = [
    ("b1", "join^2 hash scan"),
    ("b2", "+window agg stream"),
    ("b3", "data -slow table"),
    ("b4", "customer^3 +order -part"),
]
# (term, boost, required, prohibited) per query
LUCENE_CLAUSES: dict[str, list[tuple[str, float, bool, bool]]] = {
    "b1": [("join", 2.0, False, False), ("hash", 1.0, False, False),
           ("scan", 1.0, False, False)],
    "b2": [("window", 1.0, True, False), ("agg", 1.0, False, False),
           ("stream", 1.0, False, False)],
    "b3": [("data", 1.0, False, False), ("slow", 1.0, False, True),
           ("table", 1.0, False, False)],
    "b4": [("customer", 3.0, False, False), ("order", 1.0, True, False),
           ("part", 1.0, False, True)],
}

# per-language sampling rates for the stratified_sample query
STRATA_RATES = {"en": 0.5, "de": 1.0, "fr": 0.25}

# tombstone rule for the bm25_topk_deleted query: every doc_id with
# doc_id % MOD == REM is deleted (deterministic at any sf)
_DELETE_MOD, _DELETE_REM = 7, 3

# Mixed Lucene queries: quoted phrase clauses composing with terms,
# boosts and MUST/MUST_NOT over the POSITIONAL index — exercises the
# phrase-in-BooleanQuery path end-to-end. Clause tables kept literally
# in sync with the query strings for the SQL oracle.
LUCENE_PHRASE_QUERIES: list[tuple[str, str]] = [
    ("m1", '"key agg" table'),
    ("m2", '+"value table" -slow'),
    ("m3", '"join batch"^2 scan'),
    ("m4", 'data -"table table"'),
]
# (term, boost, required, prohibited)
LP_TERM_CLAUSES: dict[str, list[tuple[str, float, bool, bool]]] = {
    "m1": [("table", 1.0, False, False)],
    "m2": [("slow", 1.0, False, True)],
    "m3": [("scan", 1.0, False, False)],
    "m4": [("data", 1.0, False, False)],
}
# (phrase, boost, required, prohibited)
LP_PHRASE_CLAUSES: dict[str, list[tuple[str, float, bool, bool]]] = {
    "m1": [("key agg", 1.0, False, False)],
    "m2": [("value table", 1.0, True, False)],
    "m3": [("join batch", 2.0, False, False)],
    "m4": [("table table", 1.0, False, True)],
}

# Fixed exact-adjacency phrase queries (positional-index path;
# bigrams chosen to occur at every sf, incl. within-doc repetition)
PHRASE_QUERIES: list[tuple[str, str]] = [
    ("p1", "table table"),
    ("p2", "key agg"),
    ("p3", "value table"),
    ("p4", "join batch"),
]

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

# Adversarial input rows for the normalization_report check: the
# synthetic corpus is clean ASCII (pre_normalize is the identity on
# it), so the report over the corpus alone is vacuously empty. These
# rows — NBSP/thin/hair/ideographic spaces, control chars, format
# chars (SHY/ZWSP/ZWNJ), NEL/LSEP/PSEP, a combining accent, a
# mojibake sequence — exercise every branch of the pre-normalize
# chain. The expected counters (NORM_EXPECTED) are frozen from the
# byte-parity-tested normalizer (tests/test_reference_parity.py runs
# pre_normalize against the reference module on 317 adversarial
# strings) and embedded in the oracle as VALUES: the same frozen-
# constant pattern as RM3_EXPANDED_QUERIES.
NORM_DIRTY_ROWS: list[str] = [
    'hello\xa0world',
    'tab\tseparated\tvalues',
    'bell\x07char and \x1b escape',
    'soft\xadhyphen inside',
    'zero\u200bwidth\u200cjoin',
    'combo cafe\u0301 accent',
    'wide\u3000ideographic space',
    'line\u2028sep and\u2029para',
    'double  space   runs',
    'nel\x85next line',
    'thin\u2009space and\u200ahair',
    'mojibake caf\xc3\xa9 text',
]
NORM_EXPECTED: list[tuple[str, int]] = [
    ('\t ->  ', 2),
    ('del \x07', 1),
    ('del \x1b', 1),
    ('del  ', 1),
    ('del \xad', 1),
    ('del \u200b', 1),
    ('del \u200c', 1),
    ('e\u0301 -> \xe9', 1),
    ('\x85 ->  ', 1),
    ('\xa0 ->  ', 1),
    ('\xc3\xa9 -> \xe9', 1),
    ('\u2009 ->  ', 1),
    ('\u200a ->  ', 1),
    ('\u2028 ->  ', 1),
    ('\u2029 ->  ', 1),
    ('\u3000 ->  ', 1),
]

_CACHE_ROOT = pathlib.Path("/tmp/patapsco_ray_cache")


def _sql_str(s: str) -> str:
    """Render a Python string as a DuckDB expression, using chr() for
    anything outside printable ASCII (control chars and non-ASCII in
    change labels would not survive a plain SQL literal)."""
    parts: list[str] = []
    buf = ""
    for ch in s:
        if 32 <= ord(ch) < 127:
            buf += ch if ch != "'" else "''"
        else:
            if buf:
                parts.append(f"'{buf}'")
                buf = ""
            parts.append(f"chr({ord(ch)})")
    if buf:
        parts.append(f"'{buf}'")
    return " || ".join(parts) if parts else "''"



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


def _index_pos_for(sf_dir: str) -> str:
    """Build (or reuse) the POSITIONAL documents index (phrase search)."""
    key = re.sub(r"[^A-Za-z0-9._-]", "_", str(sf_dir).strip("/"))
    index_dir = _CACHE_ROOT / f"{key}-docs-pos-v1"
    build_index(
        f"{sf_dir}/documents.parquet",
        index_dir,
        text_config=SQL_TEXT_CONFIG,
        id_column="doc_id",
        text_column="text",
        html_column=None,
        rows_per_segment=200,
        positions=True,
    )
    return str(index_dir)


def _index_deleted_for(sf_dir: str) -> str:
    """Build (or reuse) a SEPARATE index copy carrying tombstones for
    every doc_id % _DELETE_MOD == _DELETE_REM (the shared cached index
    must stay tombstone-free for the other retrieval queries)."""
    key = re.sub(r"[^A-Za-z0-9._-]", "_", str(sf_dir).strip("/"))
    index_dir = _CACHE_ROOT / f"{key}-docs-del-v1"
    build_index(
        f"{sf_dir}/documents.parquet",
        index_dir,
        text_config=SQL_TEXT_CONFIG,
        id_column="doc_id",
        text_column="text",
        html_column=None,
        rows_per_segment=200,
    )
    from patapsco_ray.index import delete_documents

    ids = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id"]).column("doc_id")
    vals = np.asarray(ids.to_numpy(zero_copy_only=False))
    victims = [str(v) for v in vals[vals % _DELETE_MOD == _DELETE_REM]]
    delete_documents(index_dir, victims)
    return str(index_dir)


def _store_for(sf_dir: str) -> str:
    """Build (or reuse) the processed-docs store for one scale factor
    (RM3 feedback needs the stored document text)."""
    store_dir = _CACHE_ROOT / (
        re.sub(r"[^A-Za-z0-9._-]", "_", str(sf_dir).strip("/"))
        + "-store-v1"
    )
    if not (store_dir / ".complete").exists():
        proc = process_documents(
            _docs(sf_dir), text_config=SQL_TEXT_CONFIG,
            id_column="doc_id", html_column=None,
        )
        write_doc_store(proc, store_dir, num_buckets=8)
        (store_dir / ".complete").touch()
    return str(store_dir)


def _scaled(x, scale: float = 1e6) -> pa.Array:
    return pa.array(
        np.floor(np.asarray(x, dtype=np.float64) * scale + 0.5
                 ).astype(np.int64)
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

    def lucene_topk(sf: str):
        # Lucene boolean syntax end-to-end: parse (boosts, +, -) ->
        # BooleanQuery evaluation -> BM25 sums; the oracle replays the
        # clause tables (LUCENE_CLAUSES, literally in sync) in SQL
        from patapsco_ray.search import search_lucene

        searcher = IndexSearcher(_index_for(sf), quantize_norms=False)
        rows_q, rows_d, rows_s = [], [], []
        for qid, qtext in LUCENE_QUERIES:
            for h in search_lucene(searcher, qtext, k=TOP_K + 16):
                rows_q.append(qid)
                rows_d.append(h["doc_id"])
                rows_s.append(h["score"])
        tbl = pa.table({
            "query_id": pa.array(rows_q, pa.string()),
            "doc_id": pa.array(rows_d, pa.string()),
            "score": pa.array(rows_s, pa.float64()),
        })
        return _rank_rounded(tbl, TOP_K)

    q["lucene_topk"] = lucene_topk

    def lucene_phrase_topk(sf: str):
        # phrase clauses inside BooleanQuery over the positional index
        from patapsco_ray.search import search_lucene

        searcher = IndexSearcher(_index_pos_for(sf), quantize_norms=False)
        rows = [(qid, h["doc_id"], h["score"])
                for qid, qtext in LUCENE_PHRASE_QUERIES
                for h in search_lucene(searcher, qtext, k=TOP_K + 16)]
        tbl = pa.table({
            "query_id": pa.array([r[0] for r in rows], pa.string()),
            "doc_id": pa.array([r[1] for r in rows], pa.string()),
            "score": pa.array([r[2] for r in rows], pa.float64()),
        })
        return _rank_rounded(tbl, TOP_K)

    q["lucene_phrase_topk"] = lucene_phrase_topk

    def bm25_deleted(sf: str):
        # Lucene tombstone semantics: deleted docs filtered from every
        # ranking, stats unchanged; the oracle applies the same
        # candidate filter with corpus-wide stats
        searcher = IndexSearcher(_index_deleted_for(sf),
                                 quantize_norms=False)
        tbl = searcher.search_batch(RETRIEVAL_QUERIES, k=TOP_K + 16)
        return _rank_rounded(tbl, TOP_K)

    q["bm25_topk_deleted"] = bm25_deleted

    def phrase(sf: str):
        # positional index: exact-adjacency phrase BM25 (summed term
        # idf, tf = phrase frequency) — beyond reference parity, whose
        # DOCS_AND_FREQS Lucene index returns empty for phrases
        searcher = IndexSearcher(_index_pos_for(sf), quantize_norms=False)
        rows = [(qid, h["doc_id"], h["score"])
                for qid, ph in PHRASE_QUERIES
                for h in searcher.search_phrase(ph, k=TOP_K + 16)]
        tbl = pa.table({
            "query_id": pa.array([r[0] for r in rows], pa.string()),
            "doc_id": pa.array([r[1] for r in rows], pa.string()),
            "score": pa.array([r[2] for r in rows], pa.float64()),
        })
        return _rank_rounded(tbl, TOP_K)

    q["phrase_topk"] = phrase

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

    def rm3(sf: str):
        # full RM3 derivation, value-checked: the oracle replicates the
        # ENTIRE algorithm in SQL — quantized-BM25 feedback search
        # (top-10 by exact score, doc_id tie-break), RM1 term weighting
        # over the feedback docs' tf/dl from the doc store, top-10
        # terms by (-p, term), z-normalize, 0.5/0.5 interpolation with
        # the original query model, weighted quantized-BM25 rescore.
        # Reference semantics: /root/reference/patapsco/retrieve.py
        # 104-113 (pyserini Rm3Reranker defaults).
        idx = _index_for(sf)
        from patapsco_ray.search.rm3 import rm3_expand

        searcher = IndexSearcher(idx)
        store = DocStore(_store_for(sf))
        qids, dids, scores = [], [], []
        for qid, text in RETRIEVAL_QUERIES:
            weights = rm3_expand(searcher, store, text)
            for hit in searcher.search_weighted(weights, k=TOP_K + 16):
                qids.append(qid)
                dids.append(hit["doc_id"])
                scores.append(hit["score"])
        tbl = pa.table({
            "query_id": pa.array(qids, pa.string()),
            "doc_id": pa.array(dids, pa.string()),
            "score": pa.array(scores, pa.float64()),
        })
        return _rank_rounded(tbl, TOP_K)

    q["rm3_topk"] = rm3

    def rm3_distributed(sf: str):
        # the SAME RM3 retrieval through the query-partitioned Ray
        # Data path (search_dataset mode="rm3": actor-held searcher +
        # doc store, two-pass expansion fans out with the query
        # partition) — must be hash-identical to rm3_topk, and shares
        # its full-derivation SQL oracle
        idx = _index_for(sf)
        from patapsco_ray.search import search_dataset

        qtbl = pa.table({
            "query_id": pa.array([q for q, _ in RETRIEVAL_QUERIES]),
            "query": pa.array([t for _, t in RETRIEVAL_QUERIES]),
        })
        tbl = search_dataset(
            qtbl, idx, k=TOP_K + 16, mode="rm3",
            doc_store_dir=_store_for(sf), concurrency=(1, 4), batch_size=1,
        ).to_arrow_refs()
        tbl = pa.concat_tables(ray.get(tbl))
        return _rank_rounded(tbl, TOP_K)

    q["rm3_distributed_topk"] = rm3_distributed

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
    q["language_id"] = lambda sf: language_id(_docs(sf))

    # winnowing with w=1 selects EVERY shingle hash, so n_selected is
    # the distinct 3-shingle count — SQL recomputes it from the text
    # without knowing the hash function (degenerate-parameter oracle;
    # the bottom-1 `fingerprints` sketch and non-degenerate winnowing
    # stay property-tested in tests/test_functions.py /
    # test_urls_quality.py)
    q["fingerprints"] = lambda sf: winnow_fingerprints(
        _docs(sf), k=3, w=1
    ).select_columns(["doc_id", "n_shingles", "n_selected"])

    def norm_report(sf: str):
        # corpus rows are clean ASCII (identity under pre_normalize);
        # the frozen NORM_DIRTY_ROWS are unioned in so the report is
        # non-trivial, and checked against the frozen NORM_EXPECTED
        # counters (VALUES oracle)
        from patapsco_ray.text.normalize import normalization_report

        dirty = ray.data.from_arrow(pa.table({
            "text": pa.array(NORM_DIRTY_ROWS, pa.string())}))
        ds = _docs(sf).select_columns(["text"]).union(dirty)
        return normalization_report(ds, text_column="text")

    q["normalization_report"] = norm_report

    # --- decontamination ---
    def _probe_docs(sf: str) -> ray.data.Dataset:
        # probe set = doc_id % 17 == 3 (vectorized batch filter)
        def pick(t: pa.Table) -> pa.Table:
            ids = np.asarray(
                t.column("doc_id").to_numpy(zero_copy_only=False))
            return t.filter(pa.array(ids % 17 == 3))

        return _docs(sf).map_batches(pick, batch_format="pyarrow")

    def contamination(sf: str):
        # probe set = every 17th doc family member (doc_id % 17 == 3);
        # 5-gram overlap counts, value-checked: the SQL oracle builds
        # the same distinct n-gram sets with window string_agg
        from patapsco_ray.functions import ngram_contamination

        out = ngram_contamination(_docs(sf), _probe_docs(sf), ngram_size=5)
        return out.map_batches(
            lambda t: pa.table({
                "doc_id": pa.compute.cast(t.column("doc_id"), pa.int64()),
                "n_matched": t.column("n_matched"),
                "n_ngrams": t.column("n_ngrams"),
            }), batch_format="pyarrow")

    q["contamination_check"] = contamination

    def decontaminated(sf: str):
        from patapsco_ray.functions import decontaminate

        kept = decontaminate(_docs(sf), _probe_docs(sf), ngram_size=5)
        return kept.map_batches(
            lambda t: pa.table({
                "doc_id": pa.compute.cast(t.column("doc_id"), pa.int64()),
            }), batch_format="pyarrow")

    q["decontaminated_ids"] = decontaminated

    def dup_spans(sf: str):
        # substring-level dedup (Lee et al. ACL 2022): maximal merged
        # runs of 10-token windows whose n-gram occurs >= 2x corpus-wide
        from patapsco_ray.functions import duplicate_spans

        return duplicate_spans(
            _docs(sf).select_columns(["doc_id", "text"]), ngram_size=10)

    q["duplicate_spans"] = dup_spans

    def despan(sf: str):
        from patapsco_ray.functions import remove_duplicate_spans

        return remove_duplicate_spans(
            _docs(sf).select_columns(["doc_id", "text"]), ngram_size=10)

    q["remove_dup_spans"] = despan

    def len_quants(sf: str):
        # exact nearest-rank quantiles via a distributed value
        # histogram — only distinct (value, count) rows shuffle
        from patapsco_ray.functions import exact_quantiles

        return exact_quantiles(
            _docs(sf).select_columns(["n_chars"]), "n_chars",
            [0.0, 0.05, 0.25, 0.5, 0.75, 0.95, 1.0])

    q["length_quantiles"] = len_quants

    def top_bigrams(sf: str):
        # corpus boilerplate profile: global top-k token bigrams via
        # batch combiner -> one groupby.sum -> local-topk -> tiny sort
        from patapsco_ray.functions import top_ngrams

        return top_ngrams(
            _docs(sf).select_columns(["text"]), n=2, k=50, min_count=2)

    q["top_ngrams"] = top_bigrams

    def tfidf_terms(sf: str):
        # per-doc top-k TF-IDF keywords; integer tf * quantized-idf
        # scores make ranks bit-reproducible in the SQL oracle
        from patapsco_ray.functions import tfidf_topk_terms

        return tfidf_topk_terms(
            _docs(sf).select_columns(["doc_id", "text"]), k=5)

    q["tfidf_topk_terms"] = tfidf_terms

    def tfidf_terms_sharded(sf: str):
        # same rows as tfidf_topk_terms, but the IDF model is FORCED
        # onto the sharded join path (broadcast_max_terms=0) — the
        # 100-TB execution shape, gated by the same SQL oracle
        from patapsco_ray.functions import tfidf_topk_terms

        return tfidf_topk_terms(
            _docs(sf).select_columns(["doc_id", "text"]), k=5,
            broadcast_max_terms=0)

    q["tfidf_topk_sharded"] = tfidf_terms_sharded

    def vstats(sf: str):
        from patapsco_ray.functions import vocab_stats

        return vocab_stats(_docs(sf).select_columns(["text"]))

    q["vocab_stats"] = vstats

    # --- deduplication ---
    q["exact_duplicates"] = lambda sf: exact_duplicates(_docs(sf))
    q["ngram_jaccard_pairs"] = lambda sf: ngram_jaccard_pairs(
        _docs(sf), threshold=0.2
    )
    # Degenerate-parameter oracles for the probabilistic pair stages:
    # signature agreement (minhash) and fingerprint equality (simhash)
    # are LOSSY projections — two docs differing by one token out of
    # 80 can agree on all 128 minhashes (p ~ (1-3/80)^128 ~ 1%) or
    # collide on the 64-bit simhash, so "threshold=1.0 == identical
    # shingle sets" does NOT hold on raw near-dup corpora (observed on
    # this corpus: (267,413) minhash, (45,413) simhash). The sound
    # degenerate construction: rewrite each doc's text to its FAMILY
    # CANONICAL (the real text of doc_id % 50) — within a family the
    # inputs are bit-identical so full agreement is CERTAIN, across
    # families the canonical texts are unrelated real docs (verified
    # distinct) so full agreement has ~2^-64-grade probability and is
    # deterministic under the fixed seeds. The whole dataflow
    # (shingle -> sig -> band -> bucket groupby -> verify -> pair
    # dedup) runs on real ~80-token texts; approximate thresholds stay
    # covered by the pytest recall tests.
    def _family_docs(sf: str) -> ray.data.Dataset:
        canon_tbl = pq.read_table(f"{sf}/documents.parquet",
                                  columns=["doc_id", "text"])
        canon = {int(d): t for d, t in zip(
            canon_tbl.column("doc_id").to_pylist(),
            canon_tbl.column("text").to_pylist()) if int(d) < 50}

        def rewrite(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_pylist()
            return pa.table({
                "doc_id": t.column("doc_id"),
                "text": pa.array([canon[int(d) % 50] for d in ids],
                                 pa.string()),
            })

        return _docs(sf).select_columns(["doc_id"]).map_batches(
            rewrite, batch_format="pyarrow")

    q["minhash_lsh_pairs"] = lambda sf: minhash_lsh_pairs(
        _family_docs(sf), threshold=1.0
    )
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
    # same family-canonical construction (see minhash comment above):
    # max_hamming=0 pairs == same-family pairs, certain within, ~2^-64
    # across; max_hamming=3 on raw text stays covered in pytest
    q["simhash_pairs"] = lambda sf: simhash_pairs(
        _family_docs(sf), max_hamming=0
    )

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
        # degenerate-parameter oracle: probes == planes probes the
        # full Hamming ball (all 2^6 buckets), so the LSH machinery
        # (hyperplane bucketing, probe-set membership filter, partial
        # top-k, per-query merge) must reproduce the exact brute-force
        # result — value-checked against SQL. Smaller radii (the
        # approximate path) stay covered in pytest.
        Q = _query_vectors(sf, 2)
        return lsh_cosine_topk(
            _emb(sf), Q, query_ids=["q0", "q1"], k=5, planes=6, probes=6
        )

    q["lsh_cosine_topk"] = lsh_topk

    def ivf_topk(sf: str):
        # degenerate-parameter oracle: nprobe == ncentroids probes
        # every cell (8-centroid quantizer; the 16-centroid variant is
        # the _fullprobe row below) — exact result, value-checked.
        Q = _query_vectors(sf, 2)
        return ivf_cosine_topk(
            _emb(sf), Q, query_ids=["q0", "q1"], k=5,
            ncentroids=8, nprobe=8,
        )

    q["ivf_cosine_topk"] = ivf_topk

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

    def kmeans_counts(sf: str):
        # distributed Lloyd refinement end-to-end: deterministic init
        # (smallest-id rows, normalized), one kmeans_refine iteration
        # (broadcast centroids + per-batch partial sums), final assign
        # -> integer cluster populations the SQL oracle replays exactly
        from patapsco_ray.functions import ivf_assign_counts

        return ivf_assign_counts(_emb(sf), ncentroids=8, refine_iters=1)

    q["kmeans_assign_counts"] = kmeans_counts

    def kmeans_par_counts(sf: str):
        # k-means|| seeding (kmeans_parallel_init) + refinement +
        # assignment. Deterministic in seed, but the weighted local
        # recluster is not SQL-expressible — no oracle entry (driver
        # records the weaker rows-only check)
        from patapsco_ray.functions import ivf_assign_counts

        return ivf_assign_counts(_emb(sf), ncentroids=8, refine_iters=1,
                                 init="kmeans_par", seed=3)

    q["kmeans_par_counts"] = kmeans_par_counts

    def qfilter(sf: str):
        from patapsco_ray.functions import quality_filter

        return quality_filter(_docs(sf), min_tokens=20,
                              max_stopword_ratio=0.5, min_unique_ratio=0.3)

    q["quality_filter"] = qfilter

    q["repetition_signals"] = lambda sf: repetition_signals(_docs(sf))

    # PII entries: the synthetic corpus has no PII, so a deterministic
    # PII-bearing suffix (email / phone / ipv4 / ssn derived from
    # doc_id) is appended with Arrow kernels; the oracle regenerates
    # the same suffix in SQL and runs the SAME RE2 patterns via
    # DuckDB's regexp functions — counts AND redacted text are
    # value-checked.
    def _pii_docs(sf: str) -> ray.data.Dataset:
        def add(t: pa.Table) -> pa.Table:
            i64 = pa.compute.cast(t.column("doc_id"), pa.int64())
            ids = pa.compute.cast(i64, pa.string())
            mod = np.mod(np.asarray(
                i64.to_numpy(zero_copy_only=False)), 10000)
            pad = pa.compute.utf8_lpad(
                pa.compute.cast(pa.array(mod), pa.string()),
                width=4, padding="0")
            text = pa.compute.binary_join_element_wise(
                pa.compute.cast(t.column("text"), pa.string()),
                " contact user", ids, "@example.com call +1 555-123-",
                pad, " ssn 123-45-6789", "")
            return pa.table({"doc_id": t.column("doc_id"), "text": text})

        return _docs(sf).select_columns(["doc_id", "text"]).map_batches(
            add, batch_format="pyarrow")

    def pii_c(sf: str):
        from patapsco_ray.functions import pii_counts

        return pii_counts(_pii_docs(sf))

    q["pii_counts"] = pii_c

    def pii_r(sf: str):
        from patapsco_ray.functions import redact_pii

        return redact_pii(_pii_docs(sf))

    q["redact_pii"] = pii_r

    def chunks(sf: str):
        from patapsco_ray.functions import chunk_documents

        return chunk_documents(_docs(sf), chunk_size=16, overlap=4)

    q["chunk_documents"] = chunks

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

    def hosts(sf: str):
        # synthesized URLs exercising userinfo / WWW / mixed case /
        # explicit port; the oracle rebuilds the same URLs and runs the
        # identical RE2 host-normalization chain in DuckDB
        from patapsco_ray.functions import host_stats

        def add_url(t: pa.Table) -> pa.Table:
            i64 = pa.compute.cast(t.column("doc_id"), pa.int64())
            d = np.asarray(i64.to_numpy(zero_copy_only=False))

            def s(x):
                return pa.compute.cast(pa.array(x), pa.string())

            url = pa.compute.binary_join_element_wise(
                "https://u", s(d % 7), "@WWW.h", s(d % 23),
                ".Example.org:8443/p/", s(d % 50), "")
            return pa.table({"url": url, "text": t.column("text")})

        ds = _docs(sf).select_columns(["doc_id", "text"]).map_batches(
            add_url, batch_format="pyarrow")
        return host_stats(ds, url_column="url", text_column="text")

    q["host_stats"] = hosts

    def sampled(sf: str):
        # deterministic hash sampling; the oracle re-derives the
        # splitmix64 hash bit-exactly in SQL (HUGEINT split-multiply)
        # so the selected id SET is value-checked
        from patapsco_ray.functions import sample_by_hash

        return sample_by_hash(
            _docs(sf).select_columns(["doc_id"]), rate=0.35, seed=9)

    q["sample_by_hash"] = sampled

    def stratified(sf: str):
        # per-language rates incl. a keep-all stratum (rate 1.0
        # exercises the 2^64-threshold full-keep path) and a non-zero
        # default for unlisted strata; hash identical to sample_by_hash
        # so the oracle shares the splitmix64 SQL derivation
        from patapsco_ray.functions import stratified_sample

        return stratified_sample(
            _docs(sf).select_columns(["doc_id", "lang"]),
            rates=STRATA_RATES, strata_column="lang", seed=9,
            default_rate=0.1)

    q["stratified_sample"] = stratified

    def budget_selected(sf: str):
        # "best N tokens" curation cut: highest-n_chars docs whose
        # running whitespace-token total stays <= 5000; distributed
        # histogram + boundary refinement, never a corpus sort — the
        # oracle is the equivalent SQL window-cumsum QUALIFY
        from patapsco_ray.functions import select_by_token_budget

        return select_by_token_budget(
            _docs(sf), budget=5000, priority_column="n_chars")

    q["select_by_token_budget"] = budget_selected

    def budget_selected_bucketed(sf: str):
        # same cut FORCED through the id-range bucket refinement
        # (max_boundary_rows=1 — the 100-TB boundary-tier shape);
        # must be row-identical to the driver-fold path
        from patapsco_ray.functions import select_by_token_budget

        return select_by_token_budget(
            _docs(sf), budget=5000, priority_column="n_chars",
            max_boundary_rows=1, id_bucket_count=8)

    q["select_by_token_budget_bucketed"] = budget_selected_bucketed

    def weighted_sample(sf: str):
        # per-row Bernoulli keep with probability (n_chars%1000)/1000,
        # decided by the deterministic splitmix64 u01 — the oracle
        # re-derives hash AND compare in SQL float64
        from patapsco_ray.functions import importance_sample

        def add_w(tbl):
            w = (np.asarray(tbl.column("n_chars").to_numpy(
                zero_copy_only=False)) % 1000) / 1000.0
            return tbl.append_column("w", pa.array(w, pa.float64()))

        ds = _docs(sf).select_columns(["doc_id", "lang", "n_chars"]) \
            .map_batches(add_w, batch_format="pyarrow")
        return importance_sample(ds, weight_column="w", seed=5) \
            .select_columns(["doc_id", "lang"])

    q["importance_sample"] = weighted_sample

    def packed(sf: str):
        # greedy token-budget packing per language group; the oracle
        # replays the identical greedy scan with a recursive CTE
        # (sequential there, vectorized searchsorted + orbit walk here)
        from patapsco_ray.functions import pack_sequences

        return pack_sequences(
            _docs(sf).select_columns(["doc_id", "lang", "text"]),
            budget=200, group_column="lang")

    q["pack_sequences"] = packed

    def shuffled(sf: str):
        # deterministic hash-order global shuffle; checking the 100
        # smallest hash keys value-checks the sort, and the oracle
        # re-derives the splitmix64 key bit-exactly in SQL
        from patapsco_ray.functions import shuffle_by_hash

        return shuffle_by_hash(
            _docs(sf).select_columns(["doc_id"]), seed=7).limit(100)

    q["shuffle_by_hash"] = shuffled

    def unigram(sf: str):
        # self-trained corpus unigram LM score: integer sums of
        # per-term quantized log-probabilities (order-independent, so
        # the SQL oracle's ln/floor reproduces values bit-for-bit)
        from patapsco_ray.functions import unigram_logprob

        return unigram_logprob(_docs(sf))

    q["unigram_logprob"] = unigram

    def unigram_sharded(sf: str):
        # the sharded-model join path (broadcast_max_terms=0), same
        # rows and oracle as unigram_logprob
        from patapsco_ray.functions import unigram_logprob

        return unigram_logprob(_docs(sf), broadcast_max_terms=0)

    q["unigram_logprob_sharded"] = unigram_sharded

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

    # --- multimodal: REAL stdlib decoders over synthesized payloads.
    # Each entry builds a deterministic binary per doc_id (8x8 RGB PNG /
    # 64-sample 16-bit WAV / PRVC frame container with an arithmetic
    # byte pattern), runs the real decode (zlib PNG inflate+unfilter,
    # RIFF PCM parse, container demux), and emits quantities the SQL
    # oracle recomputes ANALYTICALLY from doc_id — so pixel values,
    # sample values and frame bytes are value-checked end-to-end.
    def mm_images(sf: str):
        def add(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_pylist()
            y, x = np.mgrid[0:8, 0:8]
            payloads = []
            for d in ids:
                d = int(d)
                px = np.stack(
                    [(d * (3 + c) + x * 7 + y * 11) % 256 for c in range(3)],
                    axis=2).astype(np.uint8)
                payloads.append(png_encode(px))
            return pa.table({"id": t.column("doc_id"),
                             "image": pa.array(payloads, pa.binary())})

        ds = _docs(sf).select_columns(["doc_id"]).map_batches(
            add, batch_format="pyarrow")
        dec = decode_images(ds, backend="real", feature_dim=16,
                            concurrency=2)

        def post(t: pa.Table) -> pa.Table:
            f = np.asarray(t.column("features").combine_chunks().flatten()
                           .to_numpy(zero_copy_only=False)).reshape(-1, 16)
            # features[0:3] are channel means / 255 (documented recipe);
            # * 255 * 64 recovers the exact integer pixel sums
            sums = np.round(f[:, 0:3] * 255.0 * 64.0).astype(np.int64)
            return pa.table({
                "id": pa.compute.cast(t.column("id"), pa.int64()),
                "width": pa.compute.cast(t.column("width"), pa.int64()),
                "height": pa.compute.cast(t.column("height"), pa.int64()),
                "channels": pa.compute.cast(t.column("channels"), pa.int64()),
                "sum_r": pa.array(sums[:, 0]),
                "sum_g": pa.array(sums[:, 1]),
                "sum_b": pa.array(sums[:, 2]),
            })

        return dec.map_batches(post, batch_format="pyarrow")

    q["decode_images"] = mm_images

    def mm_audio(sf: str):
        def add(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_pylist()
            i = np.arange(64, dtype=np.int64)
            payloads = []
            for d in ids:
                s = ((int(d) * 7 + i * 13) % 2000 - 1000).astype(np.int16)
                payloads.append(wav_encode(s, sample_rate=8000,
                                           sample_width=2))
            return pa.table({"id": t.column("doc_id"),
                             "audio": pa.array(payloads, pa.binary())})

        ds = _docs(sf).select_columns(["doc_id"]).map_batches(
            add, batch_format="pyarrow")
        dec = extract_audio_features(ds, backend="real", feature_dim=8,
                                     concurrency=2)

        def post(t: pa.Table) -> pa.Table:
            f = np.asarray(t.column("features").combine_chunks().flatten()
                           .to_numpy(zero_copy_only=False)).reshape(-1, 8)
            return pa.table({
                "id": pa.compute.cast(t.column("id"), pa.int64()),
                "duration_ms": t.column("duration_ms"),
                "sample_rate": pa.compute.cast(
                    t.column("sample_rate"), pa.int64()),
                "mean_1e9": _scaled(f[:, 0], 1e9),
                "rms_1e9": _scaled(f[:, 1], 1e9),
                "max_abs_1e9": _scaled(f[:, 2], 1e9),
            })

        return dec.map_batches(post, batch_format="pyarrow")

    q["audio_features"] = mm_audio

    def mm_video(sf: str):
        def add(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_pylist()
            payloads = []
            for d in ids:
                d = int(d)
                frames = []
                for f in range(d % 7 + 1):
                    ln = 16 + (d + f) % 8
                    frames.append(bytes(
                        (d * 5 + f * 3 + j) % 256 for j in range(ln)))
                payloads.append(video_container_encode(frames))
            return pa.table({"id": t.column("doc_id"),
                             "video": pa.array(payloads, pa.binary())})

        ds = _docs(sf).select_columns(["doc_id"]).map_batches(
            add, batch_format="pyarrow")
        sampled = sample_video_frames(ds, backend="real", every_n=2,
                                      max_frames=3)

        def post(t: pa.Table) -> pa.Table:
            frames = t.column("frame").to_pylist()
            return pa.table({
                "id": pa.compute.cast(t.column("id"), pa.int64()),
                "frame_index": pa.compute.cast(
                    t.column("frame_index"), pa.int64()),
                "n_bytes": pa.array([len(b) for b in frames], pa.int64()),
                "byte_sum": pa.array([int(sum(b)) for b in frames],
                                     pa.int64()),
            })

        return sampled.map_batches(post, batch_format="pyarrow")

    q["video_frames"] = mm_video

    def warc_roundtrip(sf: str):
        # webtext ingestion: serialize the documents table as crawl-style
        # WARC (one gzip member per record, half `response` records with
        # an HTTP envelope, half bare `conversion` records), read it back
        # through the WARC source, and verify byte-identity against the
        # parquet original. Exercises ISO 28500 record grammar, HTTP
        # payload stripping and the gzip-member decode on every row.
        from patapsco_ray.sources.warc import (
            build_http_response, build_warc_record, read_warc_documents,
            write_warc_file,
        )

        warc_dir = _CACHE_ROOT / (
            re.sub(r"[^A-Za-z0-9._-]", "_", str(sf).strip("/")) + "-warc-v1")
        if not (warc_dir / ".complete").exists():
            warc_dir.mkdir(parents=True, exist_ok=True)
            tbl = pq.read_table(f"{sf}/documents.parquet",
                                columns=["doc_id", "text"])
            ids = tbl.column("doc_id").to_pylist()
            texts = tbl.column("text").to_pylist()
            n_files = max(2, len(ids) // 4096)
            for f in range(n_files):
                recs = []
                for i in range(f, len(ids), n_files):
                    d, payload = ids[i], texts[i].encode("utf-8")
                    uri = f"http://example.org/doc/{d}"
                    if d % 2 == 0:
                        recs.append(build_warc_record(
                            "response",
                            build_http_response(
                                payload,
                                content_type="text/plain; charset=utf-8"),
                            record_id=str(d), target_uri=uri))
                    else:
                        recs.append(build_warc_record(
                            "conversion", payload, record_id=str(d),
                            target_uri=uri,
                            content_type="text/plain; charset=utf-8"))
                write_warc_file(recs, warc_dir / f"part-{f:04d}.warc.gz")
            (warc_dir / ".complete").touch()
        ds = read_warc_documents(str(warc_dir / "*.warc.gz"))

        def post(t: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": pa.compute.cast(t.column("doc_id"), pa.int64()),
                "url": t.column("url"),
                "text": t.column("text"),
            })

        return ds.map_batches(post, batch_format="pyarrow")

    q["warc_roundtrip"] = warc_roundtrip

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
  {{cand_filter}}
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


def _lucene_values() -> str:
    rows = []
    for qid, clauses in LUCENE_CLAUSES.items():
        for t, b, req, proh in clauses:
            rows.append(f"('{qid}', '{t}', {b}, "
                        f"{str(req).lower()}, {str(proh).lower()})")
    return ", ".join(rows)


# BooleanQuery over BM25 (engine search_lucene flat path): score =
# sum of boost x per-term BM25 over non-prohibited matched clauses;
# docs must match ALL required terms (or >= 1 optional term when no
# required clause exists) and none of the prohibited ones.
_LUCENE_SQL = f"""
WITH c(query_id, term, boost, req, proh) AS (VALUES {{values}}),
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
hits AS (
  SELECT c.query_id, tf.doc_id, c.term, c.boost, c.req, c.proh,
         {_BM25_TERM} AS w
  FROM c JOIN tf ON tf.term = c.term
         JOIN df ON df.term = c.term
         JOIN dl ON dl.doc_id = tf.doc_id
         CROSS JOIN stats s),
mc AS (SELECT query_id, count(*) AS n_must FROM c WHERE req
       GROUP BY query_id),
agg AS (
  SELECT h.query_id, h.doc_id,
    sum(CASE WHEN NOT h.proh THEN h.boost * h.w ELSE 0 END) AS score,
    count(DISTINCT CASE WHEN h.req THEN h.term END) AS must_hit,
    count(CASE WHEN h.proh THEN 1 END) AS proh_hit,
    count(CASE WHEN NOT h.req AND NOT h.proh THEN 1 END) AS should_hit
  FROM hits h GROUP BY h.query_id, h.doc_id),
keep AS (
  SELECT a.query_id, a.doc_id,
    CAST(FLOOR(a.score * 1000000 + 0.5) AS BIGINT) AS score_1e6
  FROM agg a LEFT JOIN mc USING (query_id)
  WHERE a.proh_hit = 0
    AND ((coalesce(mc.n_must, 0) > 0
          AND a.must_hit = coalesce(mc.n_must, 0))
         OR (coalesce(mc.n_must, 0) = 0 AND a.should_hit > 0)))
SELECT query_id, doc_id,
  CAST(row_number() OVER (PARTITION BY query_id
       ORDER BY score_1e6 DESC, doc_id) - 1 AS BIGINT) AS rank,
  score_1e6
FROM keep QUALIFY rank < {TOP_K} ORDER BY query_id, rank
"""


def _lp_values(clauses: dict) -> str:
    return ", ".join(
        f"('{qid}', '{key}', {b}, {str(req).lower()}, {str(proh).lower()})"
        for qid, rows in clauses.items()
        for key, b, req, proh in rows)


# BooleanQuery with phrase clauses over the positional index: phrase
# clauses score as Lucene PhraseQuery (summed constituent-term idf,
# tf = exact adjacent-bigram count) and gate exactly like term clauses
# (MUST/SHOULD/MUST_NOT, boost multiplies the contribution).
_LUCENE_PHRASE_SQL = f"""
WITH tc(query_id, term, boost, req, proh) AS (VALUES {{tvalues}}),
pc(query_id, phrase, boost, req, proh) AS (VALUES {{pvalues}}),
toksl AS (SELECT doc_id,
    list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents),
toks AS (SELECT doc_id, unnest(t) AS term FROM toksl),
dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toksl),
stats AS (SELECT count(*)::DOUBLE AS n,
                 (SELECT sum(dl) FROM dl) / count(*)::DOUBLE AS avgdl
          FROM documents),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
       FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
       FROM toks GROUP BY term),
big AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
        FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
              FROM toksl WHERE len(t) >= 2)),
ptf AS (SELECT pc.query_id, pc.phrase, b.doc_id, count(*)::DOUBLE AS tf
        FROM pc JOIN big b ON b.g = pc.phrase GROUP BY 1, 2, 3),
pidf AS (SELECT p.query_id, p.phrase,
           sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))) AS idf
         FROM (SELECT query_id, phrase,
                 unnest(string_split(phrase, ' ')) AS term FROM pc) p
         JOIN df USING (term) CROSS JOIN stats s GROUP BY 1, 2),
term_hits AS (
  SELECT tc.query_id, tf.doc_id, tc.term AS ck, tc.boost, tc.req,
         tc.proh, {_BM25_TERM} AS w
  FROM tc JOIN tf ON tf.term = tc.term
       JOIN df ON df.term = tc.term
       JOIN dl ON dl.doc_id = tf.doc_id
       CROSS JOIN stats s),
phrase_hits AS (
  SELECT p.query_id, p.doc_id, p.phrase AS ck, pc.boost, pc.req,
         pc.proh,
         i.idf * p.tf
           / (p.tf + 0.9 * (1 - 0.4 + 0.4 * dl.dl / s.avgdl)) AS w
  FROM ptf p
       JOIN pc ON pc.query_id = p.query_id AND pc.phrase = p.phrase
       JOIN pidf i ON i.query_id = p.query_id AND i.phrase = p.phrase
       JOIN dl ON dl.doc_id = p.doc_id
       CROSS JOIN stats s),
hits AS (SELECT * FROM term_hits UNION ALL SELECT * FROM phrase_hits),
mc AS (SELECT query_id, count(*) AS n_must FROM
       (SELECT query_id, req FROM tc
        UNION ALL SELECT query_id, req FROM pc)
       WHERE req GROUP BY query_id),
agg AS (
  SELECT h.query_id, h.doc_id,
    sum(CASE WHEN NOT h.proh THEN h.boost * h.w ELSE 0 END) AS score,
    count(DISTINCT CASE WHEN h.req THEN h.ck END) AS must_hit,
    count(CASE WHEN h.proh THEN 1 END) AS proh_hit,
    count(CASE WHEN NOT h.req AND NOT h.proh THEN 1 END) AS should_hit
  FROM hits h GROUP BY h.query_id, h.doc_id),
keep AS (
  SELECT a.query_id, a.doc_id,
    CAST(FLOOR(a.score * 1000000 + 0.5) AS BIGINT) AS score_1e6
  FROM agg a LEFT JOIN mc USING (query_id)
  WHERE a.proh_hit = 0
    AND ((coalesce(mc.n_must, 0) > 0
          AND a.must_hit = coalesce(mc.n_must, 0))
         OR (coalesce(mc.n_must, 0) = 0 AND a.should_hit > 0)))
SELECT query_id, doc_id,
  CAST(row_number() OVER (PARTITION BY query_id
       ORDER BY score_1e6 DESC, doc_id) - 1 AS BIGINT) AS rank,
  score_1e6
FROM keep QUALIFY rank < {TOP_K} ORDER BY query_id, rank
"""


def _phrase_values() -> str:
    return ", ".join(f"('{qid}', '{ph}')" for qid, ph in PHRASE_QUERIES)


# Phrase BM25 (Lucene PhraseQuery shape): tf = exact count of adjacent
# windows equal to the phrase, idf = sum of the constituent terms' idfs
# (multiplicity included), exact doc lengths (quantize_norms=False).
_PHRASE_SQL = f"""
WITH q(query_id, phrase) AS (VALUES {{values}}),
toksl AS (SELECT doc_id,
    list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
  FROM documents),
toks AS (SELECT doc_id, unnest(t) AS term FROM toksl),
dl AS (SELECT doc_id, len(t)::DOUBLE AS dl FROM toksl),
stats AS (SELECT count(*)::DOUBLE AS n,
                 (SELECT sum(dl) FROM dl) / count(*)::DOUBLE AS avgdl
          FROM documents),
big AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
        FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
              FROM toksl WHERE len(t) >= 2)),
ptf AS (SELECT q.query_id, b.doc_id, count(*)::DOUBLE AS tf
        FROM q JOIN big b ON b.g = q.phrase GROUP BY 1, 2),
qt AS (SELECT query_id, unnest(string_split(phrase, ' ')) AS term FROM q),
df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
       FROM toks GROUP BY term),
idf AS (SELECT qt.query_id,
          sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))) AS idf
        FROM qt JOIN df USING (term) CROSS JOIN stats s GROUP BY 1),
scored AS (SELECT p.query_id, p.doc_id,
    i.idf * p.tf / (p.tf + 0.9 * (1 - 0.4 + 0.4 * dl.dl / s.avgdl))
      AS score
  FROM ptf p JOIN idf i USING (query_id)
       JOIN dl ON dl.doc_id = p.doc_id CROSS JOIN stats s)
SELECT query_id, doc_id,
  CAST(row_number() OVER (PARTITION BY query_id
       ORDER BY score_1e6 DESC, doc_id) - 1 AS BIGINT) AS rank,
  score_1e6
FROM (SELECT query_id, doc_id,
        CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT) AS score_1e6
      FROM scored)
QUALIFY rank < {TOP_K} ORDER BY query_id, rank
"""


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


def _qmap_values() -> str:
    """The byte4 dl -> quantized-dl mapping (Lucene SmallFloat norm
    semantics, a fixed public table) as SQL VALUES pairs."""
    from patapsco_ray.index.norms import DECODE_TABLE, encode_lengths

    dls = np.arange(4096, dtype=np.int64)
    dlq = DECODE_TABLE[encode_lengths(dls)]
    return ", ".join(f"({int(d)}, {float(q)})" for d, q in zip(dls, dlq))


def _quantized_bm25_sql() -> str:
    """BM25 over byte4-QUANTIZED doc lengths (the engine's default,
    Lucene SmallFloat norm semantics)."""
    pairs = _qmap_values()
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


def _rm3_sql() -> str:
    """The FULL RM3 derivation in SQL (reference semantics at
    /root/reference/patapsco/retrieve.py:104-113; our rm3_expand in
    search/rm3.py): quantized-BM25 feedback search -> top-10 docs by
    (exact score desc, doc_id asc) -> RM1 term weights
    p(t) = sum_d (score_d / sum_scores) * tf(t,d) / dl(d) over the
    feedback docs -> top-10 terms by (p desc, term asc), normalized ->
    0.5/0.5 interpolation with the uniform original query model ->
    weighted quantized-BM25 rescore, rounded-rank tail like every
    other retrieval oracle."""
    quant_term = ("ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) "
                  "* tf.tf / (tf.tf + 0.9 * (1 - 0.4 + 0.4 * dlq.dlq "
                  "/ s.avgdl))")
    return f"""
WITH q(query_id, term) AS (VALUES {_queries_values()}),
toks AS ({_TOKS}),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf
       FROM toks GROUP BY doc_id, term),
dl AS (SELECT d.doc_id, count(t.term) AS dl
       FROM documents d LEFT JOIN toks t USING (doc_id)
       GROUP BY d.doc_id),
qmap(dl, dlq) AS (VALUES {_qmap_values()}),
dlq AS (SELECT dl.doc_id, qmap.dlq FROM dl JOIN qmap USING (dl)),
stats AS (SELECT count(*)::DOUBLE AS n,
                 (SELECT sum(dl) FROM dl) / count(*)::DOUBLE AS avgdl
          FROM documents),
df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
       FROM toks GROUP BY term),
s1 AS (
  SELECT q.query_id, tf.doc_id, sum({quant_term}) AS score
  FROM q JOIN tf ON tf.term = q.term
         JOIN df ON df.term = q.term
         JOIN dlq ON dlq.doc_id = tf.doc_id
         CROSS JOIN stats s
  GROUP BY 1, 2),
fb AS (SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, doc_id) AS rn
       FROM s1 QUALIFY rn <= 10),
ssum AS (SELECT query_id, sum(score) AS ssum FROM fb GROUP BY query_id),
rm1 AS (
  SELECT fb.query_id, tf.term,
         sum((fb.score / ssum.ssum) * tf.tf / dl.dl) AS p
  FROM fb JOIN ssum USING (query_id)
       JOIN tf ON tf.doc_id = fb.doc_id
       JOIN dl ON dl.doc_id = fb.doc_id
  GROUP BY 1, 2),
fbtop AS (SELECT query_id, term, p,
            row_number() OVER (PARTITION BY query_id
                ORDER BY p DESC, term) AS rn
          FROM rm1 QUALIFY rn <= 10),
z AS (SELECT query_id, sum(p) AS z FROM fbtop GROUP BY query_id),
nq AS (SELECT query_id, count(*)::DOUBLE AS nq FROM q GROUP BY query_id),
model AS (
  SELECT COALESCE(o.query_id, f.query_id) AS query_id,
         COALESCE(o.term, f.term) AS term,
         0.5 * COALESCE(o.w, 0.0) + 0.5 * COALESCE(f.pn, 0.0) AS w
  FROM (SELECT q.query_id, q.term, 1.0 / nq.nq AS w
        FROM q JOIN nq USING (query_id)) o
  FULL JOIN (SELECT fbtop.query_id, fbtop.term, fbtop.p / z.z AS pn
             FROM fbtop JOIN z USING (query_id)) f
    ON o.query_id = f.query_id AND o.term = f.term),
scored AS (
  SELECT m.query_id, tf.doc_id, sum(m.w * ({quant_term})) AS score
  FROM model m JOIN tf ON tf.term = m.term
       JOIN df ON df.term = m.term
       JOIN dlq ON dlq.doc_id = tf.doc_id
       CROSS JOIN stats s
  GROUP BY 1, 2)
SELECT query_id, doc_id,
  CAST(row_number() OVER (PARTITION BY query_id
       ORDER BY score_1e6 DESC, doc_id) - 1 AS BIGINT) AS rank,
  score_1e6
FROM (SELECT query_id, doc_id,
        CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT) AS score_1e6
      FROM scored)
QUALIFY rank < {TOP_K} ORDER BY query_id, rank
"""


def _pii_sql(mode: str) -> str:
    """Oracle for the PII entries: regenerate the deterministic
    doc_id-derived PII suffix in SQL, then run the SAME RE2 patterns
    (pyarrow and DuckDB both use RE2) — per-pattern match counts or
    the chained redaction, value-checked."""
    from patapsco_ray.functions.pii import PII_PATTERNS

    full = ("d.text || ' contact user' || CAST(d.doc_id AS VARCHAR) || "
            "'@example.com call +1 555-123-' || "
            "lpad(CAST(d.doc_id % 10000 AS VARCHAR), 4, '0') || "
            "' ssn 123-45-6789'")
    if mode == "counts":
        cols = ", ".join(
            f"CAST(len(regexp_extract_all(t.full, '{pat}')) AS BIGINT)"
            f" AS n_{name}"
            for name, pat, _rep in PII_PATTERNS)
        return (f"WITH t AS (SELECT d.doc_id, {full} AS full "
                f"FROM documents d) "
                f"SELECT t.doc_id, {cols} FROM t")
    expr = "t.full"
    for _name, pat, rep in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return (f"WITH t AS (SELECT d.doc_id, {full} AS full "
            f"FROM documents d) "
            f"SELECT t.doc_id, {expr} AS text FROM t")


def _sample_sql() -> str:
    from patapsco_ray.functions.sampling import sample_by_hash_sql

    pred = sample_by_hash_sql("doc_id", rate=0.35, seed=9)
    return f"SELECT doc_id FROM documents WHERE {pred}"


def _token_budget_sql() -> str:
    # window-cumsum QUALIFY form of select_by_token_budget: running
    # whitespace-token total over (n_chars DESC, doc_id ASC) <= 5000
    return """
        WITH t AS (
          SELECT doc_id,
            len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS n_tokens,
            n_chars
          FROM documents),
        c AS (
          SELECT doc_id, n_tokens,
            sum(n_tokens) OVER (
              ORDER BY n_chars DESC, doc_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t)
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
        FROM c WHERE cum <= 5000"""


def _importance_sql() -> str:
    from patapsco_ray.functions.budget import importance_sample_sql

    pred = importance_sample_sql("doc_id", "(n_chars % 1000) / 1000.0",
                                 seed=5)
    return f"SELECT doc_id, lang FROM documents WHERE {pred}"


def _stratified_sql() -> str:
    from patapsco_ray.functions.sampling import stratified_sample_sql

    pred = stratified_sample_sql(
        "doc_id", "lang", STRATA_RATES, seed=9, default_rate=0.1)
    return f"SELECT doc_id, lang FROM documents WHERE {pred}"


def _shuffle_sql() -> str:
    from patapsco_ray.functions.sampling import _salt, splitmix64_sql

    h = splitmix64_sql(
        f"CAST(xor(CAST(doc_id AS UBIGINT), "
        f"CAST({_salt(7)} AS UBIGINT)) AS HUGEINT)")
    return (f"SELECT doc_id, CAST(({h}) AS UBIGINT) AS shuffle_key "
            f"FROM documents ORDER BY shuffle_key LIMIT 100")


# the oracle replays pack_sequences' greedy scan sequentially: a
# recursive CTE threading (acc, pack_id, pack_pos) doc-by-doc in
# doc_id order within each lang group
_PACK_SQL = r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, lang,
        len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
          AS n
      FROM documents),
    o AS (
      SELECT doc_id, lang, n,
        row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM toks),
    r AS (
      SELECT lang, rn, doc_id, n, n AS acc,
        CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS pack_pos
      FROM o WHERE rn = 1
      UNION ALL
      SELECT o.lang, o.rn, o.doc_id, o.n,
        CASE WHEN r.acc + o.n > 200 THEN o.n ELSE r.acc + o.n END,
        CASE WHEN r.acc + o.n > 200 THEN r.pack_id + 1
             ELSE r.pack_id END,
        CASE WHEN r.acc + o.n > 200 THEN 0 ELSE r.pack_pos + 1 END
      FROM r JOIN o ON o.lang = r.lang AND o.rn = r.rn + 1
    )
    SELECT doc_id, lang, CAST(n AS BIGINT) AS n_tokens,
      pack_id, pack_pos
    FROM r"""


_UNIGRAM_SQL = r"""
    WITH toks AS (
      SELECT doc_id, t.term
      FROM documents,
        unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
          AS t(term)
    ),
    stats AS (SELECT term, count(*) AS cf FROM toks GROUP BY term),
    tot AS (SELECT count(*) AS n FROM toks),
    q AS (
      SELECT term,
        CAST(floor(ln(cf::DOUBLE / tot.n) * 1000000 + 0.5) AS BIGINT)
          AS qlp
      FROM stats, tot
    )
    SELECT d.doc_id,
      count(t.term) AS n_tokens,
      CAST(coalesce(sum(q.qlp), 0) AS BIGINT) AS sum_logprob_q
    FROM documents d
    LEFT JOIN toks t USING (doc_id)
    LEFT JOIN q ON t.term = q.term
    GROUP BY d.doc_id"""


def _norm_report_sql() -> str:
    """VALUES oracle of the frozen NORM_EXPECTED counters (labels
    rendered with chr() so control chars survive)."""
    rows = ", ".join(f"({_sql_str(c)}, {n})" for c, n in NORM_EXPECTED)
    return (f"SELECT change, CAST(cnt AS BIGINT) AS count FROM "
            f"(VALUES {rows}) t(change, cnt)")


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
    return _add_sharded_model_oracles({
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
        "warc_roundtrip": """
            SELECT doc_id, 'http://example.org/doc/' || doc_id AS url,
                   text
            FROM documents""",
        "bm25_topk": _RETRIEVAL_BASE.format(
            values=_queries_values(), term_score=_BM25_TERM,
            cand_filter="",
        ),
        "lucene_topk": _LUCENE_SQL.format(values=_lucene_values()),
        "lucene_phrase_topk": _LUCENE_PHRASE_SQL.format(
            tvalues=_lp_values(LP_TERM_CLAUSES),
            pvalues=_lp_values(LP_PHRASE_CLAUSES)),
        "qld_topk": _RETRIEVAL_BASE.format(
            values=_queries_values(), term_score=_QLD_TERM,
            cand_filter="",
        ),
        # Lucene delete semantics: tombstoned docs filtered from
        # CANDIDACY only — every statistic (n, avgdl, df, cf, dl)
        # still counts them, so surviving docs' scores are unchanged
        "bm25_topk_deleted": _RETRIEVAL_BASE.format(
            values=_queries_values(), term_score=_BM25_TERM,
            cand_filter=f"WHERE tf.doc_id % {_DELETE_MOD} <> {_DELETE_REM}",
        ),
        "phrase_topk": _PHRASE_SQL.format(values=_phrase_values()),
        "psq_topk": _PSQ_SQL.format(values=_psq_values()),
        # weighted BM25 over the frozen RM3 expansions: score =
        # sum_t w_t * idf(t) * tf/(tf+denom) with exact doc lengths
        "rm3_weighted_topk": _RETRIEVAL_BASE.replace(
            "q(query_id, term)", "q(query_id, term, w)"
        ).format(
            values=_rm3_weighted_values(),
            term_score=f"q.w * ({_BM25_TERM})",
            cand_filter="",
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
        "sample_by_hash": _sample_sql(),
        "stratified_sample": _stratified_sql(),
        "select_by_token_budget": _token_budget_sql(),
        "select_by_token_budget_bucketed": _token_budget_sql(),
        "importance_sample": _importance_sql(),
        "pack_sequences": _PACK_SQL,
        "shuffle_by_hash": _shuffle_sql(),
        "unigram_logprob": _UNIGRAM_SQL,
        "host_stats": r"""
            WITH u AS (SELECT d.text,
                'https://u' || CAST(d.doc_id % 7 AS VARCHAR)
                || '@WWW.h' || CAST(d.doc_id % 23 AS VARCHAR)
                || '.Example.org:8443/p/'
                || CAST(d.doc_id % 50 AS VARCHAR) AS url
              FROM documents d),
            h AS (SELECT regexp_replace(regexp_replace(regexp_replace(
                    lower(regexp_extract(url, '://([^/?#]+)', 1)),
                    '^.*@', ''), ':[0-9]+$', ''), '^www\.', '') AS host,
                  text FROM u)
            SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(length(text)) AS BIGINT) AS total_chars
            FROM h GROUP BY host""",
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
        "contamination_check": """
            WITH toks AS (
              SELECT doc_id,
                list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
              FROM documents),
            grams AS (
              SELECT DISTINCT doc_id, unnest(CASE WHEN len(t) < 5
                THEN [array_to_string(t, ' ')]
                ELSE list_transform(range(1, len(t) - 3),
                  i -> array_to_string(t[i:i+4], ' ')) END) AS g
              FROM toks WHERE len(t) > 0),
            pg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 3),
            sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
            m AS (SELECT grams.doc_id, count(*) AS nm
                  FROM grams JOIN pg USING (g) GROUP BY 1)
            SELECT d.doc_id,
              CAST(COALESCE(m.nm, 0) AS BIGINT) AS n_matched,
              CAST(COALESCE(s.n, 0) AS BIGINT) AS n_ngrams
            FROM documents d
            LEFT JOIN sizes s ON d.doc_id = s.doc_id
            LEFT JOIN m ON d.doc_id = m.doc_id""",
        "decontaminated_ids": """
            WITH toks AS (
              SELECT doc_id,
                list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
              FROM documents),
            grams AS (
              SELECT DISTINCT doc_id, unnest(CASE WHEN len(t) < 5
                THEN [array_to_string(t, ' ')]
                ELSE list_transform(range(1, len(t) - 3),
                  i -> array_to_string(t[i:i+4], ' ')) END) AS g
              FROM toks WHERE len(t) > 0),
            pg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 17 = 3),
            bad AS (SELECT DISTINCT grams.doc_id
                    FROM grams JOIN pg USING (g))
            SELECT d.doc_id FROM documents d
            WHERE d.doc_id NOT IN (SELECT doc_id FROM bad)""",
        "duplicate_spans": """
            WITH toks AS (
              SELECT doc_id,
                list_filter(string_split(lower(text), ' '), x -> x <> '') AS t
              FROM documents),
            grams AS (
              SELECT doc_id, i, array_to_string(t[i:i+9], ' ') AS g
              FROM (SELECT doc_id, t, unnest(range(1, len(t) - 8)) AS i
                    FROM toks WHERE len(t) >= 10)),
            dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
            hits AS (SELECT grams.doc_id, grams.i - 1 AS s
                     FROM grams JOIN dup USING (g)),
            brk AS (
              SELECT doc_id, s, CASE WHEN s > lag(s) OVER
                  (PARTITION BY doc_id ORDER BY s) + 10 THEN 1 ELSE 0
                END AS b
              FROM hits),
            isl AS (
              SELECT doc_id, s, sum(b) OVER (PARTITION BY doc_id
                  ORDER BY s ROWS UNBOUNDED PRECEDING) AS island
              FROM brk)
            SELECT doc_id, CAST(min(s) AS BIGINT) AS span_start,
                   CAST(max(s) + 10 AS BIGINT) AS span_end
            FROM isl GROUP BY doc_id, island""",
        "remove_dup_spans": """
            WITH raw AS (
              SELECT doc_id,
                list_filter(string_split(text, ' '), x -> x <> '') AS rt
              FROM documents),
            lt AS (SELECT doc_id, rt,
                     list_transform(rt, x -> lower(x)) AS t FROM raw),
            grams AS (
              SELECT doc_id, i, array_to_string(t[i:i+9], ' ') AS g
              FROM (SELECT doc_id, t, unnest(range(1, len(t) - 8)) AS i
                    FROM lt WHERE len(t) >= 10)),
            dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
            hits AS (SELECT grams.doc_id, grams.i - 1 AS s
                     FROM grams JOIN dup USING (g)),
            covered AS (SELECT DISTINCT doc_id, s + j.j AS p
                        FROM hits CROSS JOIN
                          (SELECT unnest(range(0, 10)) AS j) j),
            toku AS (SELECT doc_id, i - 1 AS p, rt[i] AS tok
                     FROM (SELECT doc_id, rt,
                             unnest(range(1, len(rt) + 1)) AS i FROM lt)),
            kept AS (SELECT tk.doc_id, tk.p, tk.tok
                     FROM toku tk LEFT JOIN covered c
                       ON c.doc_id = tk.doc_id AND c.p = tk.p
                     WHERE c.doc_id IS NULL),
            agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text
                    FROM kept GROUP BY doc_id)
            SELECT d.doc_id, COALESCE(a.text, '') AS text
            FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""",
        "length_quantiles": " UNION ALL ".join(
            f"SELECT CAST({int(round(qq * 1e6))} AS BIGINT) AS q_1e6, "
            f"quantile_disc(n_chars, {qq}) AS value FROM documents"
            for qq in (0.0, 0.05, 0.25, 0.5, 0.75, 0.95, 1.0)),
        "top_ngrams": """
            WITH toks AS (
              SELECT list_filter(string_split(lower(text), ' '),
                                 x -> x <> '') AS t
              FROM documents),
            g AS (SELECT t[x] || ' ' || t[x+1] AS ngram
                  FROM toks, unnest(range(1, len(t))) AS r(x))
            SELECT ngram, CAST(count(*) AS BIGINT) AS n_occurrences
            FROM g GROUP BY ngram HAVING count(*) >= 2
            ORDER BY n_occurrences DESC, ngram ASC LIMIT 50""",
        "tfidf_topk_terms": f"""
            WITH toks AS ({_TOKS}),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM toks GROUP BY doc_id, term),
            df AS (SELECT term, count(DISTINCT doc_id) AS df
                   FROM toks GROUP BY term),
            n AS (SELECT count(*) AS n FROM documents),
            q AS (SELECT term,
                    CAST(floor(ln(n.n::DOUBLE / df.df) * 1000000 + 0.5)
                         AS BIGINT) AS qidf
                  FROM df, n),
            s AS (SELECT tf.doc_id, tf.term,
                    CAST(tf.tf * q.qidf AS BIGINT) AS tfidf_q
                  FROM tf JOIN q USING (term))
            SELECT doc_id, term,
              CAST(row_number() OVER (PARTITION BY doc_id
                   ORDER BY tfidf_q DESC, term) - 1 AS BIGINT) AS rank,
              tfidf_q
            FROM s QUALIFY rank < 5""",
        "vocab_stats": f"""
            WITH toks AS ({_TOKS}),
            cf AS (SELECT term, count(*) AS cf FROM toks GROUP BY term)
            SELECT CAST(count(*) AS BIGINT) AS n_terms,
              CAST(coalesce(sum(cf), 0) AS BIGINT) AS n_tokens,
              CAST(coalesce(sum(CASE WHEN cf = 1 THEN 1 END), 0)
                   AS BIGINT) AS n_hapax,
              CAST(coalesce(max(cf), 0) AS BIGINT) AS max_cf
            FROM cf""",
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
        "rm3_topk": _rm3_sql(),
        # the distributed path must produce byte-identical results, so
        # it shares the full-derivation oracle
        "rm3_distributed_topk": _rm3_sql(),
        "repetition_signals": f"""
            WITH toks AS ({_TOKS}),
            tf AS (SELECT doc_id, term, count(*) AS c
                   FROM toks GROUP BY doc_id, term),
            mx AS (SELECT doc_id, max(c) AS m, sum(c) AS nt
                   FROM tf GROUP BY doc_id),
            tl AS (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '),
                                 x -> x <> '') AS t
                   FROM documents),
            pos AS (SELECT doc_id, unnest(list_transform(
                      range(1, len(t)), i -> t[i] || chr(1) || t[i+1]))
                      AS g
                    FROM tl WHERE len(t) >= 2),
            agg AS (SELECT doc_id, count(*) AS np, count(DISTINCT g) AS nd
                    FROM pos GROUP BY doc_id)
            SELECT d.doc_id,
              CAST(COALESCE(mx.nt, 0) AS BIGINT) AS n_tokens,
              CAST(FLOOR(COALESCE(mx.m * 1.0 / mx.nt, 0.0) * 1000000
                   + 0.5) AS BIGINT) AS top_token_frac_1e6,
              CAST(FLOOR(COALESCE((agg.np - agg.nd) * 1.0 / agg.np, 0.0)
                   * 1000000 + 0.5) AS BIGINT) AS dup_ngram_frac_1e6
            FROM documents d
            LEFT JOIN mx USING (doc_id)
            LEFT JOIN agg USING (doc_id)""",
        "pii_counts": _pii_sql("counts"),
        "redact_pii": _pii_sql("redact"),
        "chunk_documents": """
            WITH toks AS (SELECT doc_id,
                list_filter(string_split(lower(text), ' '), x -> x <> '')
                  AS t FROM documents),
            c AS (SELECT doc_id, t, i.range AS ci
                  FROM toks CROSS JOIN range(64) i
                  WHERE i.range * 12 < len(t))
            SELECT doc_id, CAST(ci AS BIGINT) AS chunk_index,
              CAST(ci * 12 AS BIGINT) AS start_token,
              CAST(LEAST(16, len(t) - ci * 12) AS BIGINT) AS n_tokens,
              array_to_string(t[ci*12+1 : ci*12+16], ' ') AS chunk_text
            FROM c""",
        "normalization_report": _norm_report_sql(),
        # winnowing with w=1 selects every shingle hash: n_selected ==
        # distinct 3-shingle count, n_shingles == shingle positions
        # (short non-empty docs contribute one whole-doc shingle)
        "fingerprints": """
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
            npos AS (SELECT doc_id, CASE WHEN len(t) = 0 THEN 0
                       WHEN len(t) < 3 THEN 1 ELSE len(t) - 2 END AS np
                     FROM toks)
            SELECT d.doc_id,
              CAST(COALESCE(npos.np, 0) AS BIGINT) AS n_shingles,
              CAST(COALESCE(sizes.n, 0) AS BIGINT) AS n_selected
            FROM documents d
            LEFT JOIN npos USING (doc_id)
            LEFT JOIN sizes USING (doc_id)""",
        # family-canonical inputs (text := text of doc_id % 50):
        # threshold=1.0 minhash pairs == same-family pairs
        "minhash_lsh_pairs": """
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(1000000 AS BIGINT) AS est_jaccard_1e6
            FROM documents a JOIN documents b
              ON a.doc_id % 50 = b.doc_id % 50 AND a.doc_id < b.doc_id""",
        # family-canonical inputs: max_hamming=0 simhash pairs ==
        # same-family pairs
        "simhash_pairs": """
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(0 AS BIGINT) AS hamming
            FROM documents a JOIN documents b
              ON a.doc_id % 50 = b.doc_id % 50 AND a.doc_id < b.doc_id""",
        # probes == planes scans every bucket: exact brute-force top-k
        "lsh_cosine_topk": """
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
        # nprobe == ncentroids probes every cell: exact brute-force
        "ivf_cosine_topk": """
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
        # one Lloyd iteration replayed: init = 8 smallest-id rows
        # (normalized), assign -> spherical re-centre -> assign ->
        # integer cluster populations
        "kmeans_assign_counts": """
            WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
              FROM embeddings),
            init AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, emb
              FROM e ORDER BY vec_id LIMIT 8),
            x AS (
              SELECT e.vec_id, r.i AS dim,
                e.emb[r.i] / sqrt(list_inner_product(e.emb, e.emb)) AS xv
              FROM e, unnest(range(1, len(emb) + 1)) AS r(i)),
            d1 AS (
              SELECT e.vec_id, i.cid,
                list_inner_product(e.emb, i.emb)
                  / sqrt(list_inner_product(i.emb, i.emb)) AS dot
              FROM e CROSS JOIN init i),
            a1 AS (
              SELECT vec_id, cid FROM (
                SELECT vec_id, cid, row_number() OVER (PARTITION BY
                    vec_id ORDER BY dot DESC, cid ASC) AS rn FROM d1)
              WHERE rn = 1),
            s AS (
              SELECT a1.cid, x.dim, sum(x.xv) AS sv
              FROM x JOIN a1 USING (vec_id) GROUP BY a1.cid, x.dim),
            cn AS (SELECT cid, sqrt(sum(sv * sv)) AS nrm
                   FROM s GROUP BY cid),
            c1 AS (SELECT s.cid, s.dim, s.sv / cn.nrm AS cv
                   FROM s JOIN cn USING (cid)),
            c1full AS (
              SELECT * FROM c1
              UNION ALL
              SELECT i.cid, r.i AS dim,
                i.emb[r.i] / sqrt(list_inner_product(i.emb, i.emb)) AS cv
              FROM init i, unnest(range(1, len(i.emb) + 1)) AS r(i)
              WHERE i.cid NOT IN (SELECT cid FROM c1)),
            d2 AS (
              SELECT x.vec_id, c.cid, sum(x.xv * c.cv) AS dot
              FROM x JOIN c1full c USING (dim)
              GROUP BY x.vec_id, c.cid),
            a2 AS (
              SELECT vec_id, cid FROM (
                SELECT vec_id, cid, row_number() OVER (PARTITION BY
                    vec_id ORDER BY dot DESC, cid ASC) AS rn FROM d2)
              WHERE rn = 1)
            SELECT cid AS centroid_id,
              CAST(count(*) AS BIGINT) AS n_members
            FROM a2 GROUP BY cid""",
        # analytic pixel sums of the synthesized 8x8 RGB PNGs
        "decode_images": """
            WITH g AS (SELECT gx.range AS x, gy.range AS y
                       FROM range(8) gx CROSS JOIN range(8) gy)
            SELECT d.doc_id AS id, CAST(8 AS BIGINT) AS width,
              CAST(8 AS BIGINT) AS height, CAST(3 AS BIGINT) AS channels,
              CAST(sum((d.doc_id * 3 + g.x * 7 + g.y * 11) % 256)
                   AS BIGINT) AS sum_r,
              CAST(sum((d.doc_id * 4 + g.x * 7 + g.y * 11) % 256)
                   AS BIGINT) AS sum_g,
              CAST(sum((d.doc_id * 5 + g.x * 7 + g.y * 11) % 256)
                   AS BIGINT) AS sum_b
            FROM documents d CROSS JOIN g GROUP BY d.doc_id""",
        # analytic stats of the synthesized 64-sample 8 kHz PCM WAVs
        "audio_features": """
            WITH s AS (SELECT d.doc_id,
                  ((d.doc_id * 7 + i.range * 13) % 2000 - 1000) / 32768.0
                    AS v
                FROM documents d CROSS JOIN range(64) i)
            SELECT doc_id AS id, CAST(8 AS BIGINT) AS duration_ms,
              CAST(8000 AS BIGINT) AS sample_rate,
              CAST(FLOOR(avg(v) * 1000000000 + 0.5) AS BIGINT) AS mean_1e9,
              CAST(FLOOR(sqrt(avg(v * v)) * 1000000000 + 0.5) AS BIGINT)
                AS rms_1e9,
              CAST(FLOOR(max(abs(v)) * 1000000000 + 0.5) AS BIGINT)
                AS max_abs_1e9
            FROM s GROUP BY doc_id""",
        # analytic sampled-frame sizes/sums of the PRVC containers:
        # doc d has (d % 7) + 1 frames; every_n=2, max_frames=3 keeps
        # original indices {0, 2, 4}; frame f has 16 + (d+f) % 8 bytes
        # with byte j = (d*5 + f*3 + j) % 256
        "video_frames": """
            WITH f AS (SELECT d.doc_id, fr.range AS f
                       FROM documents d CROSS JOIN range(5) fr
                       WHERE fr.range % 2 = 0
                         AND fr.range < (d.doc_id % 7) + 1),
            b AS (SELECT doc_id, f, j.range AS j
                  FROM f CROSS JOIN range(24) j
                  WHERE j.range < 16 + (doc_id + f) % 8)
            SELECT doc_id AS id, CAST(f AS BIGINT) AS frame_index,
              CAST(16 + (doc_id + f) % 8 AS BIGINT) AS n_bytes,
              CAST(sum((doc_id * 5 + f * 3 + j) % 256) AS BIGINT)
                AS byte_sum
            FROM b GROUP BY doc_id, f""",
    })


def _add_sharded_model_oracles(sql: dict[str, str]) -> dict[str, str]:
    """The sharded-model (join-path) variants compute IDENTICAL rows to
    their broadcast twins — same SQL, full value-hash gate on the
    100-TB execution shape."""
    sql["tfidf_topk_sharded"] = sql["tfidf_topk_terms"]
    sql["unigram_logprob_sharded"] = sql["unigram_logprob"]
    return sql
