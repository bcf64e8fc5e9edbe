"""Index build + BM25/QLD retrieval conformance tests.

BM25 goldens are hand-computed with Lucene-8 math (the reference's
scoring via pyserini, SURVEY.md §2.6) on the reference's 4-doc corpus
(/root/reference/tests/test_psq.py:29-32).
"""
import math
import pathlib
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from patapsco_ray.index.build import build_index
from patapsco_ray.search.engine import IndexSearcher
from patapsco_ray.text import TextConfig

DOCS = {
    "1": "gato felino",
    "2": "gato and some extra words gato",
    "3": "felino",
    "4": "gato",
}
CFG = TextConfig(tokenize="whitespace", stopwords=False, stem=False)


def idf(df, n=4):
    return math.log(1 + (n - df + 0.5) / (df + 0.5))


def w(tf, dl, k1, b, avgdl=2.5):
    return tf / (tf + k1 * (1 - b + b * dl / avgdl))


@pytest.fixture(scope="module")
def corpus_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("idx4")
    inp = root / "input"
    inp.mkdir()
    pq.write_table(
        pa.table({"url": list(DOCS), "text": list(DOCS.values())}),
        inp / "docs.parquet",
    )
    manifest = build_index(str(inp), str(root / "index"), text_config=CFG,
                           html_column=None)
    return root / "index", manifest


def test_manifest_stats(corpus_index):
    _, manifest = corpus_index
    assert manifest["ndocs"] == 4
    assert manifest["total_tf"] == 10
    assert manifest["avgdl"] == pytest.approx(2.5)


def test_bm25_single_term(corpus_index):
    index_dir, _ = corpus_index
    s = IndexSearcher(index_dir, scorer="bm25", k1=1.2, b=0.75, text_config=CFG)
    hits = s.search("gato", k=10)
    exp = sorted(
        [(d, idf(3) * w({"1": 1, "2": 2, "4": 1}[d], {"1": 2, "2": 6, "4": 1}[d],
                        1.2, 0.75)) for d in ("1", "2", "4")],
        key=lambda x: -x[1],
    )
    assert [h["doc_id"] for h in hits] == [d for d, _ in exp]
    for h, (_, score) in zip(hits, exp):
        assert h["score"] == pytest.approx(score, abs=1e-12)
    assert [h["rank"] for h in hits] == [0, 1, 2]


def test_bm25_repeated_query_term(corpus_index):
    index_dir, _ = corpus_index
    s = IndexSearcher(index_dir, scorer="bm25", k1=0.9, b=0.4, text_config=CFG)

    def full(d):
        sc = 0.0
        tf_g = {"1": 1, "2": 2, "4": 1}.get(d, 0)
        tf_f = {"1": 1, "3": 1}.get(d, 0)
        dl = {"1": 2, "2": 6, "3": 1, "4": 1}[d]
        if tf_g:
            sc += 2 * idf(3) * w(tf_g, dl, 0.9, 0.4)
        if tf_f:
            sc += idf(2) * w(tf_f, dl, 0.9, 0.4)
        return sc

    hits = s.search("gato gato felino", k=10)
    exp = sorted(((d, full(d)) for d in "1234"), key=lambda x: (-x[1], x[0]))
    assert [h["doc_id"] for h in hits] == [d for d, _ in exp]
    for h, (_, score) in zip(hits, exp):
        assert h["score"] == pytest.approx(score, abs=1e-12)


def test_missing_term_returns_empty(corpus_index):
    index_dir, _ = corpus_index
    s = IndexSearcher(index_dir, text_config=CFG)
    assert s.search("unseen", k=10) == []


def test_qld(corpus_index):
    index_dir, _ = corpus_index
    s = IndexSearcher(index_dir, scorer="qld", mu=1000, text_config=CFG)
    hits = s.search("gato felino", k=10)
    # LMDirichlet: score per matching term, clamped at 0
    mu = 1000.0

    def qld(d):
        tf_g = {"1": 1, "2": 2, "4": 1}.get(d, 0)
        tf_f = {"1": 1, "3": 1}.get(d, 0)
        dl = {"1": 2, "2": 6, "3": 1, "4": 1}[d]
        sc = 0.0
        for tf, cf in ((tf_g, 4), (tf_f, 2)):
            if tf:
                sc += max(
                    0.0,
                    math.log(1 + tf / (mu * cf / 10)) + math.log(mu / (dl + mu)),
                )
        return sc

    exp = sorted(((d, qld(d)) for d in "1234"), key=lambda x: (-x[1], x[0]))
    assert [h["doc_id"] for h in hits] == [d for d, _ in exp]
    for h, (_, score) in zip(hits, exp):
        assert h["score"] == pytest.approx(score, abs=1e-12)


def test_multi_segment_equals_single(ray_session, tmp_path):
    """Same corpus in 1 segment vs 4 segments must rank identically."""
    inp = tmp_path / "inp"
    inp.mkdir()
    # one file per doc -> rows_per_segment=1 forces 4 segments
    for i, (d, t) in enumerate(DOCS.items()):
        pq.write_table(pa.table({"url": [d], "text": [t]}),
                       inp / f"f{i}.parquet")
    m1 = build_index(str(inp), str(tmp_path / "idx1"), text_config=CFG,
                     html_column=None)
    m4 = build_index(str(inp), str(tmp_path / "idx4"), text_config=CFG,
                     html_column=None, rows_per_segment=1)
    assert len(m4["segments"]) == 4
    s1 = IndexSearcher(tmp_path / "idx1", k1=1.2, b=0.75, text_config=CFG)
    s4 = IndexSearcher(tmp_path / "idx4", k1=1.2, b=0.75, text_config=CFG)
    for q in ("gato", "felino", "gato felino", "extra words"):
        h1 = [(h["doc_id"], round(h["score"], 10)) for h in s1.search(q)]
        h4 = [(h["doc_id"], round(h["score"], 10)) for h in s4.search(q)]
        assert h1 == h4, q


def test_resume_skips_complete_segments(ray_session, tmp_path):
    inp = tmp_path / "inp"
    inp.mkdir()
    pq.write_table(
        pa.table({"url": list(DOCS), "text": list(DOCS.values())}),
        inp / "docs.parquet",
    )
    idx = tmp_path / "idx"
    m1 = build_index(str(inp), str(idx), text_config=CFG, html_column=None)
    meta_path = idx / "seg=000000" / "meta.json"
    mtime = meta_path.stat().st_mtime_ns
    m2 = build_index(str(inp), str(idx), text_config=CFG, html_column=None,
                     resume=True)
    assert meta_path.stat().st_mtime_ns == mtime  # untouched -> skipped
    assert m2["ndocs"] == m1["ndocs"]
    # resume=False rebuilds
    build_index(str(inp), str(idx), text_config=CFG, html_column=None,
                resume=False)
    assert meta_path.stat().st_mtime_ns != mtime


def test_prune_matches_exhaustive(ray_session, tmp_path):
    import numpy as np
    rng = np.random.default_rng(3)
    n = 2000
    vocab = [f"t{i}" for i in range(50)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 40)))
        for _ in range(n)
    ]
    inp = tmp_path / "inp"
    inp.mkdir()
    pq.write_table(
        pa.table({"url": [f"d{i}" for i in range(n)], "text": texts}),
        inp / "docs.parquet",
    )
    build_index(str(inp), str(tmp_path / "idx"), text_config=CFG,
                html_column=None)
    s = IndexSearcher(tmp_path / "idx", text_config=CFG)
    seg = s.manifest["segments"][0]
    ss = s._segment(seg)
    from patapsco_ray.search.engine import lookup_global_stats
    from patapsco_ray.search.scorer import QLDScorer

    # single- and multi-term queries, both scorers, several k: the
    # block-max WAND path must be EXACTLY the dense result (ordinals
    # and bitwise scores — same fp ops by construction)
    queries = [
        {"t0": 1},                          # head term
        {"t0": 1, "t7": 1, "t33": 2},       # mixed df, qtf>1
        {"t3": 1, "t44": 1},
        {f"t{i}": 1 for i in range(10)},    # broad disjunction
        {"t49": 1, "zzz-absent": 1},        # partial vocabulary
    ]
    terms = sorted({t for q in queries for t in q})
    g = lookup_global_stats(s.index_dir, terms)
    qld = QLDScorer(s.scorer.stats)
    for scorer in (s.scorer, qld):
        for q in queries:
            for k in (1, 10, 100):
                o1, sc1 = ss.score(q, scorer, g, k=k, prune=False)
                o2, sc2 = ss.score(q, scorer, g, k=k, prune=True)
                assert np.array_equal(o1, o2), (q, k)
                assert np.array_equal(sc1, sc2), (q, k)

    # prune="auto": identical hits to dense, engages per rarest-term
    # selectivity (df/N <= AUTO_PRUNE_DF_RATIO)
    sa = IndexSearcher(tmp_path / "idx", text_config=CFG, prune="auto")
    for text in ("t0", "t0 t7 t33", "t3 t44"):
        assert sa.search(text, k=50) == s.search(text, k=50), text
    assert sa._resolve_prune({}, g, 10) is False
    assert sa._resolve_prune({"zzz-absent": 1}, g, 10) is False
    # all 50 vocab terms are head terms on this corpus: never engages
    assert sa._resolve_prune({"t0": 1}, g, 10) is False
    # a term matching <=1% of docs flips it on
    rare_g = dict(g)
    rare_g["t0"] = (int(0.005 * sa.stats.ndocs), 5)
    assert sa._resolve_prune({"t0": 1, "t7": 1}, rare_g, 10) is True


def test_explain_sums_to_score(corpus_index):
    """explain(): per-term contributions reproduce the search score
    (reference log_explanations parity, retrieve.py:144,153-165)."""
    from patapsco_ray.search.engine import explain

    index_dir, _ = corpus_index
    s = IndexSearcher(index_dir, text_config=CFG)
    hits = s.search("gato felino extra", k=4)
    assert hits
    for h in hits:
        ex = explain(s, "gato felino extra", h["doc_id"])
        assert ex["score"] == pytest.approx(h["score"], rel=1e-12)
        assert sum(t["contribution"] for t in ex["terms"]) == \
            pytest.approx(h["score"], rel=1e-12)
        assert any(t["tf"] > 0 for t in ex["terms"])
    with pytest.raises(KeyError):
        explain(s, "gato", "no-such-doc")


def test_edge_empty_and_null_inputs(ray_session, tmp_path):
    """Edge inputs: empty corpus builds a searchable empty index;
    null-text rows index with dl=0; a pathless build errors clearly
    (reference GlobIterator empty-match validation)."""
    import pyarrow as pa

    empty = tmp_path / "empty"
    empty.mkdir()
    pq.write_table(
        pa.table({"url": pa.array([], pa.string()),
                  "text": pa.array([], pa.string())}),
        empty / "e.parquet")
    m = build_index(str(empty), tmp_path / "eidx", text_config=CFG,
                    html_column=None)
    assert m["ndocs"] == 0
    assert IndexSearcher(tmp_path / "eidx").search("anything") == []

    nulls = tmp_path / "nulls"
    nulls.mkdir()
    pq.write_table(
        pa.table({"url": ["a", "b"],
                  "text": pa.array(["hello world", None], pa.string())}),
        nulls / "n.parquet")
    m2 = build_index(str(nulls), tmp_path / "nidx", text_config=CFG,
                     html_column=None)
    assert m2["ndocs"] == 2 and m2["total_tf"] == 2
    hits = IndexSearcher(tmp_path / "nidx").search("hello", k=5)
    assert [h["doc_id"] for h in hits] == ["a"]

    nofiles = tmp_path / "nofiles"
    nofiles.mkdir()
    with pytest.raises(FileNotFoundError):
        build_index(str(nofiles), tmp_path / "xidx")


def test_unfinalized_index_fails_loudly(ray_session, tmp_path):
    """An index built with finalize=False has no global stats; opening
    a searcher on it must error clearly, not silently match nothing."""
    import pyarrow as pa

    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(pa.table({"url": ["x"], "text": ["hello"]}),
                   d / "d.parquet")
    build_index(str(d), tmp_path / "idx", text_config=CFG,
                html_column=None, finalize=False)
    with pytest.raises(FileNotFoundError, match="finalize"):
        IndexSearcher(tmp_path / "idx")


def test_global_terms_multishard_pruning(ray_session, tmp_path, monkeypatch):
    """The Ray finalize branch (>LOCAL_FINALIZE_ROWS) must write
    term-range-sorted shards + a _ranges.json sidecar, and
    lookup_global_stats must (a) return the same stats as the local
    branch and (b) actually skip shards outside the query's range."""
    import json

    import numpy as np

    from patapsco_ray.index import build as build_mod
    from patapsco_ray.search import engine as engine_mod

    rng = np.random.default_rng(7)
    vocab = [f"w{i:04d}" for i in range(400)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(4, 20)))
        for _ in range(1500)
    ]
    inp = tmp_path / "inp"
    inp.mkdir()
    pq.write_table(
        pa.table({"url": [f"d{i}" for i in range(1500)], "text": texts}),
        inp / "docs.parquet",
    )
    idx = tmp_path / "idx"
    man = build_index(str(inp), str(idx), text_config=CFG, html_column=None,
                      rows_per_segment=300, finalize=True)
    # local-branch answer (ground truth)
    probe = ["w0001", "w0199", "w0399", "never-indexed"]
    local = engine_mod.lookup_global_stats(idx, probe)

    # force the distributed branch: multi-shard range-partitioned merge
    monkeypatch.setattr(build_mod, "LOCAL_FINALIZE_ROWS", 0)
    build_mod.finalize_index(idx, man)
    shards = sorted((idx / "global_terms").glob("*.parquet"))
    ranges = json.loads((idx / "global_terms" / "_ranges.json").read_text())
    assert len(shards) > 1, "expected a multi-shard global_terms"
    assert set(ranges) == {s.name for s in shards}
    # shards are disjoint, sorted term ranges
    spans = sorted(ranges.values())
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2

    dist = engine_mod.lookup_global_stats(idx, probe)
    assert dist == local

    # pruning: a term inside exactly one shard's range must read only
    # that shard (count pq.read_table calls inside the lookup)
    one = spans[0][0]  # first shard's min term: unique to that shard
    calls = []
    real = engine_mod.pq.read_table

    def counting(f, *a, **k):
        calls.append(str(f))
        return real(f, *a, **k)

    monkeypatch.setattr(engine_mod.pq, "read_table", counting)
    got = engine_mod.lookup_global_stats(idx, [one])
    assert one in got
    assert len(calls) == 1, calls


def test_torn_global_terms_tmp_ignored(ray_session, tmp_path):
    """A crashed/retried shard write leaves only a .tmp file (writes
    are tmp+rename): lookup and search must ignore it."""
    import pathlib

    inp = tmp_path / "inp"
    inp.mkdir()
    pq.write_table(
        pa.table({"url": ["d1", "d2"], "text": ["hello world", "hello"]}),
        inp / "docs.parquet")
    build_index(str(inp), str(tmp_path / "idx"), text_config=CFG,
                html_column=None)
    gt = pathlib.Path(tmp_path / "idx" / "global_terms")
    torn = gt / "part-deadbeef.parquet.tmp"
    torn.write_bytes(b"torn parquet bytes")
    s = IndexSearcher(tmp_path / "idx", text_config=CFG)
    hits = s.search("hello", k=10)
    assert [h["doc_id"] for h in hits] and len(hits) == 2
