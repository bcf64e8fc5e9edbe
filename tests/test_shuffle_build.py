"""Shuffle-path index build: rank/score identity with the aligned
build, salting behavior, manifest lineage."""

import pyarrow.parquet as pq

from patapsco_ray.index.segment import read_terms
import pytest

from patapsco_ray.index import build_index, build_index_shuffle
from patapsco_ray.search import IndexSearcher
from patapsco_ray.sources import generate_webpages
from patapsco_ray.text import TextConfig


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    paths = generate_webpages(d, 2000, num_files=3)
    return paths


@pytest.fixture(scope="module")
def indexes(corpus, tmp_path_factory):
    cfg = TextConfig(stem="porter")
    a = tmp_path_factory.mktemp("idx") / "aligned"
    s = tmp_path_factory.mktemp("idx") / "shuffle"
    ma = build_index(corpus, a, text_config=cfg, rows_per_segment=700)
    ms = build_index_shuffle(corpus, s, text_config=cfg,
                             rows_per_block=700, salt_range_rows=512)
    return (str(a), ma), (str(s), ms)


def test_manifests_agree(indexes):
    (_, ma), (_, ms) = indexes
    assert ms["ndocs"] == ma["ndocs"] == 2000
    assert ms["total_tf"] == ma["total_tf"]
    assert ms["strategy"] == "shuffle"
    assert len(ms["segments"]) == 1


def test_rank_score_identity(indexes):
    (a, _), (s, _) = indexes
    sa, ss = IndexSearcher(a), IndexSearcher(s)
    for q in ["world state people", "the term00042", "work life time year"]:
        ha = [(h["doc_id"], round(h["score"], 9)) for h in sa.search(q, k=15)]
        hs = [(h["doc_id"], round(h["score"], 9)) for h in ss.search(q, k=15)]
        assert ha == hs, q


def test_salting_splits_head_terms(indexes):
    (_, _), (s, ms) = indexes
    # pick the highest-df term: its postings span many 512-doc salt
    # ranges; blocks from separate salted runs must decode to one
    # ascending ordinal sequence
    all_terms = read_terms(s, "g00000",
                              columns=["term", "df"])
    head = max(zip(all_terms.column("df").to_pylist(),
                   all_terms.column("term").to_pylist()))[1]
    t = read_terms(s, "g00000", terms=[head])
    assert t.num_rows == 1
    assert t.column("df")[0].as_py() > 512  # really spans salt ranges
    from patapsco_ray.index import decode_postings
    ords, tfs = decode_postings(
        t.column("postings")[0].as_py(),
        t.column("block_offsets")[0].as_py(),
        t.column("block_counts")[0].as_py(),
    )
    assert len(ords) == t.column("df")[0].as_py()
    assert (ords[1:] > ords[:-1]).all()


def test_global_terms_written(indexes):
    (_, _), (s, _) = indexes
    import glob
    files = glob.glob(f"{s}/global_terms/*.parquet")
    assert files
    t = pq.read_table(files)
    assert {"term", "df", "cf"} <= set(t.schema.names)
