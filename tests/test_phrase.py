"""Positional index + exact-adjacency phrase BM25 (opt-in beyond
reference parity: the reference's Lucene index is DOCS_AND_FREQS only,
/root/reference/patapsco/index.py:52, so its phrase queries return
empty)."""

import math
import pathlib
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from patapsco_ray.index import build_index
from patapsco_ray.index.codec import decode_positions, encode_positions_bulk
from patapsco_ray.search import IndexSearcher
from patapsco_ray.text import TextConfig

DOCS = [
    ("d1", "the quick brown fox jumps over the lazy dog"),
    ("d2", "quick brown dog sits and the brown fox runs quick brown fox"),
    ("d3", "fox brown quick no phrase here at all today"),
    ("d4", "lazy afternoon a quick brown fox and a quick brown fox again"),
    ("d5", "completely unrelated words in this one document"),
]
CFG = TextConfig(tokenize="whitespace", stopwords=False, stem=False,
                 lowercase=True)


def _brute_scores(docs, phrase, k1=0.9, b=0.4):
    m = phrase.split()
    tfs, dls = {}, {}
    for d, t in docs:
        toks = t.lower().split()
        dls[d] = len(toks)
        tfs[d] = sum(1 for i in range(len(toks) - len(m) + 1)
                     if toks[i:i + len(m)] == m)
    n = len(docs)
    avgdl = sum(dls.values()) / n
    idf = 0.0
    for term in m:
        df = sum(1 for _, t in docs if term in t.lower().split())
        idf += math.log(1 + (n - df + 0.5) / (df + 0.5))
    return {d: idf * tf / (tf + k1 * (1 - b + b * dls[d] / avgdl))
            for d, tf in tfs.items() if tf}


@pytest.fixture(scope="module")
def pos_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("phrase")
    corpus = root / "corpus"
    corpus.mkdir()
    pq.write_table(pa.table({"url": [d for d, _ in DOCS],
                             "text": [t for _, t in DOCS]}),
                   corpus / "a.parquet")
    idx = root / "idx"
    man = build_index(str(corpus), idx, text_config=CFG,
                      rows_per_segment=2, positions=True)
    assert man["positions"] is True
    return str(idx)


def test_phrase_scores_match_brute_force(pos_index):
    s = IndexSearcher(pos_index, quantize_norms=False)
    for phrase in ("quick brown fox", "brown fox", "quick brown"):
        exp = _brute_scores(DOCS, phrase)
        got = {h["doc_id"]: h["score"] for h in s.search_phrase(phrase, k=10)}
        assert set(got) == set(exp), phrase
        for d, v in exp.items():
            assert got[d] == pytest.approx(v, abs=1e-12), (phrase, d)


def test_phrase_order_matters(pos_index):
    s = IndexSearcher(pos_index, quantize_norms=False)
    # all three terms present in d3 but never adjacent in this order
    assert s.search_phrase("fox quick brown", k=10) == []
    assert s.search_phrase("zebra unicorn", k=10) == []


def test_within_doc_repetition_raises_tf(pos_index):
    s = IndexSearcher(pos_index, quantize_norms=False)
    hits = {h["doc_id"]: h for h in s.search_phrase("quick brown fox", k=10)}
    # d4 has the phrase twice, d1 once, similar lengths -> d4 outranks
    assert hits["d4"]["rank"] < hits["d1"]["rank"]


def test_phrase_requires_positional_index(ray_session, tmp_path):
    corpus = tmp_path / "c"
    corpus.mkdir()
    pq.write_table(pa.table({"url": ["a"], "text": ["x y z"]}),
                   corpus / "a.parquet")
    build_index(str(corpus), tmp_path / "idx", text_config=CFG)
    s = IndexSearcher(tmp_path / "idx", quantize_norms=False)
    with pytest.raises(ValueError, match="positions"):
        s.search_phrase("x y")


def test_phrase_requires_bm25(pos_index):
    s = IndexSearcher(pos_index, scorer="qld", quantize_norms=False)
    with pytest.raises(ValueError, match="bm25"):
        s.search_phrase("quick brown")


def test_compact_preserves_phrase_rankings(pos_index, tmp_path):
    # position streams merge by byte concatenation (each posting opens
    # with an absolute value); phrase results must be identical across
    # the physical merge
    from patapsco_ray.index.compact import compact_index

    man = compact_index(pos_index, tmp_path / "out",
                        target_docs_per_segment=100)
    assert man["positions"] is True
    assert len(man["segments"]) == 1
    a = IndexSearcher(pos_index, quantize_norms=False)
    b = IndexSearcher(tmp_path / "out", quantize_norms=False)
    for phrase in ("quick brown fox", "brown fox", "the lazy"):
        ha = [(h["doc_id"], round(h["score"], 10))
              for h in a.search_phrase(phrase, k=10)]
        hb = [(h["doc_id"], round(h["score"], 10))
              for h in b.search_phrase(phrase, k=10)]
        assert ha == hb, phrase


def test_positions_over_post_stopword_stream(ray_session, tmp_path):
    # with stopword removal, adjacency is over the surviving stream:
    # "quick the fox" indexes as quick,fox -> phrase "quick fox" matches
    corpus = tmp_path / "c"
    corpus.mkdir()
    pq.write_table(pa.table({
        "url": ["a", "b"],
        "text": ["quick the fox runs", "quick dog fox runs"],
    }), corpus / "a.parquet")
    cfg = TextConfig(tokenize="whitespace", stopwords="lucene",
                     stem=False, lowercase=True)
    build_index(str(corpus), tmp_path / "idx", text_config=cfg,
                positions=True)
    s = IndexSearcher(tmp_path / "idx", quantize_norms=False)
    got = [h["doc_id"] for h in s.search_phrase("quick fox", k=10)]
    assert got == ["a"]


def test_positions_codec_segment_roundtrip(pos_index):
    # read the raw terms table and decode every term's positions; the
    # reconstructed per-document streams must be 0..dl-1 when pooled
    from patapsco_ray.index.segment import read_docs, read_terms
    from patapsco_ray.search.engine import read_manifest

    man = read_manifest(pos_index)
    for seg in man["segments"]:
        t = read_terms(pos_index, seg["seg_id"])
        docs = read_docs(pos_index, seg["seg_id"])
        from patapsco_ray.index.codec import decode_postings

        per_doc: dict[int, list[int]] = {}
        for r in t.to_pylist():
            ords, tfs = decode_postings(
                r["postings"], r["block_offsets"], r["block_counts"])
            pos = decode_positions(r["positions"], int(tfs.sum()), tfs)
            off = np.concatenate([[0], np.cumsum(tfs)])
            for i, o in enumerate(ords):
                per_doc.setdefault(int(o), []).extend(
                    pos[off[i]:off[i + 1]].tolist())
        for o, plist in per_doc.items():
            dl = docs.column("dl")[o].as_py()
            assert sorted(plist) == list(range(dl))


def test_search_dataset_phrase_matches_local(pos_index):
    from patapsco_ray.search import search_dataset

    queries = pa.table({
        "query_id": ["p1", "p2", "p3"],
        "query": ["quick brown fox", "brown fox", "zebra unicorn"],
    })
    dist = search_dataset(queries, pos_index, k=10, mode="phrase",
                          concurrency=2, quantize_norms=False).to_pandas()
    local = IndexSearcher(pos_index, quantize_norms=False)
    for qid, qtext in zip(queries.column("query_id").to_pylist(),
                          queries.column("query").to_pylist()):
        want = [(h["doc_id"], h["rank"], round(h["score"], 9))
                for h in local.search_phrase(qtext, k=10)]
        got = dist[dist["query_id"] == qid].sort_values("rank")
        assert [(d, r, round(s, 9)) for d, r, s in
                zip(got["doc_id"], got["rank"], got["score"])] == want


def test_encode_positions_bulk_empty():
    enc = encode_positions_bulk(
        np.empty(0, np.int64), np.empty(0, np.int64), np.array([0, 0]))
    assert enc["data"] == b""
    assert enc["term_byte_offsets"].tolist() == [0, 0]


def test_search_dataset_lucene_matches_local(pos_index):
    from patapsco_ray.search import search_dataset, search_lucene

    queries = pa.table({
        "query_id": ["l1", "l2", "l3"],
        "query": ['"quick brown" fox^2', '+fox -"quick brown"',
                  "(quick OR fox) AND brown"],
    })
    dist = search_dataset(queries, pos_index, k=10, mode="lucene",
                          concurrency=2, quantize_norms=False).to_pandas()
    local = IndexSearcher(pos_index, quantize_norms=False)
    for qid, qtext in zip(queries.column("query_id").to_pylist(),
                          queries.column("query").to_pylist()):
        want = [(h["doc_id"], h["rank"], round(h["score"], 9))
                for h in search_lucene(local, qtext, k=10)]
        got = dist[dist["query_id"] == qid].sort_values("rank")
        assert [(d, r, round(s, 9)) for d, r, s in
                zip(got["doc_id"], got["rank"], got["score"])] == want
