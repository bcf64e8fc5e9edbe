"""Document tombstones: delete_documents + search-time filtering
(Lucene two-phase semantics) and physical purge at compaction."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from patapsco_ray.index import (build_index, compact_index,
                                delete_documents, read_deleted_ids,
                                read_manifest)
from patapsco_ray.search import IndexSearcher
from patapsco_ray.text.processor import TextConfig


VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "rare"]


def _corpus(tmp_path, n=400, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        k = int(rng.integers(5, 40))
        words = list(rng.choice(VOCAB[:-1], size=k))
        if i % 37 == 0:
            words += ["rare"] * (1 + i % 3)
        rows.append({"url": f"doc{i:04d}", "text": " ".join(words)})
    p = tmp_path / "corpus.parquet"
    pq.write_table(pa.Table.from_pylist(rows), p)
    return str(p)


@pytest.fixture()
def built(tmp_path, ray_session):
    path = _corpus(tmp_path)
    idx = str(tmp_path / "idx")
    build_index([path], idx, text_config=TextConfig(),
                rows_per_segment=100, html_column=None)
    return idx


def test_delete_filters_results_keeps_scores(built):
    s = IndexSearcher(built)
    before = s.search("rare alpha", k=10)
    assert len(before) == 10
    victims = {before[0]["doc_id"], before[3]["doc_id"]}
    n = delete_documents(built, victims)
    assert n == 2
    # idempotent union
    assert delete_documents(built, list(victims)[:1]) == 2

    s2 = IndexSearcher(built)
    after = s2.search("rare alpha", k=10)
    assert len(after) == 10, "still k live results"
    got_ids = {r["doc_id"] for r in after}
    assert not (victims & got_ids)
    # Lucene semantics: stats unchanged -> surviving docs keep their
    # exact scores and relative order
    surv = [r for r in before if r["doc_id"] not in victims]
    for w, g in zip(surv, after):
        assert w["doc_id"] == g["doc_id"]
        assert w["score"] == g["score"]


def test_delete_blockmax_matches_dense(built):
    victims = None
    s = IndexSearcher(built)
    top = s.search("rare", k=5)
    victims = [top[0]["doc_id"]]
    delete_documents(built, victims)

    dense = IndexSearcher(built, prune=False)
    wand = IndexSearcher(built, prune=True)
    for q in ["rare", "rare alpha beta", "delta epsilon"]:
        a = dense.search(q, k=7)
        b = wand.search(q, k=7)
        assert a == b, f"block-max diverged from dense for {q!r}"
        assert victims[0] not in {r["doc_id"] for r in a}


def test_purge_compaction_matches_fresh_build(built, tmp_path, ray_session):
    s = IndexSearcher(built)
    top = s.search("rare alpha gamma", k=8)
    victims = {top[0]["doc_id"], top[5]["doc_id"]}
    delete_documents(built, victims)

    out = str(tmp_path / "compacted")
    compact_index(built, out, target_docs_per_segment=250)
    assert read_deleted_ids(out) is None, "purged index carries no tombstones"
    man = read_manifest(out)

    # fresh build over the corpus minus the victims: the purged index
    # must score identically (all stats recomputed)
    src = pq.read_table(str(tmp_path / "corpus.parquet"))
    keep = ~np.isin(
        np.asarray(src.column("url").to_numpy(zero_copy_only=False),
                   dtype=object),
        np.asarray(sorted(victims), dtype=object))
    p2 = tmp_path / "corpus2.parquet"
    pq.write_table(src.filter(pa.array(keep)), p2)
    idx2 = str(tmp_path / "idx2")
    build_index([str(p2)], idx2, text_config=TextConfig(),
                rows_per_segment=100, html_column=None)
    man2 = read_manifest(idx2)
    assert man["ndocs"] == man2["ndocs"]
    assert man["total_tf"] == man2["total_tf"]

    sa = IndexSearcher(out)
    sb = IndexSearcher(idx2)
    for q in ["rare alpha gamma", "beta", "delta zeta epsilon"]:
        ra = sa.search(q, k=10)
        rb = sb.search(q, k=10)
        assert ra == rb, f"purged vs fresh mismatch for {q!r}"


def test_purge_positional_index_phrase_search(tmp_path, ray_session):
    rows = [{"url": f"d{i}", "text": "the quick brown fox jumps " * (1 + i % 3)}
            for i in range(30)]
    rows += [{"url": f"n{i}", "text": "brown quick fox the slow"}
             for i in range(10)]
    p = tmp_path / "c.parquet"
    pq.write_table(pa.Table.from_pylist(rows), p)
    idx = str(tmp_path / "pidx")
    build_index([str(p)], idx, text_config=TextConfig(stopwords=False),
                rows_per_segment=16, html_column=None, positions=True)
    s = IndexSearcher(idx)
    before = s.search_phrase("quick brown fox", k=5)
    assert before, "phrase should match"
    victim = before[0]["doc_id"]
    delete_documents(idx, [victim])

    # search-time filter
    s2 = IndexSearcher(idx)
    mid = s2.search_phrase("quick brown fox", k=5)
    assert victim not in {h["doc_id"] for h in mid}

    # purge keeps positions working and drops the victim physically
    out = str(tmp_path / "pidx2")
    compact_index(idx, out, target_docs_per_segment=1000)
    s3 = IndexSearcher(out)
    after = s3.search_phrase("quick brown fox", k=5)
    assert victim not in {h["doc_id"] for h in after}
    assert {h["doc_id"] for h in after} == {h["doc_id"] for h in mid}
    assert s3.search_phrase("fox quick brown", k=5) == []


def test_compact_without_deletes_unchanged(built, tmp_path, ray_session):
    s = IndexSearcher(built)
    want = s.search("rare alpha", k=10)
    out = str(tmp_path / "plain_compacted")
    compact_index(built, out, target_docs_per_segment=250)
    got = IndexSearcher(out).search("rare alpha", k=10)
    assert want == got
