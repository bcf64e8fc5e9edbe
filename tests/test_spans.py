"""Duplicate n-gram span detection / removal (functions/spans.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from patapsco_ray.functions.spans import (
    _merge_runs,
    duplicate_spans,
    remove_duplicate_spans,
)
from patapsco_ray.functions.quantiles import exact_quantiles, value_histogram


def _ds(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def _spans_df(ds, **kw):
    out = duplicate_spans(ds, **kw).to_pandas()
    return out.sort_values(["doc_id", "span_start"]).reset_index(drop=True)


def test_merge_runs_overlap_adjacent_and_gap():
    docs = np.array([0, 0, 0, 0, 1], dtype=np.int64)
    pos = np.array([0, 2, 5, 9, 0], dtype=np.int64)
    # w=3: [0,3)+[2,5) overlap, [5,8) touches, [9,12) gaps; doc break
    starts_at, s, e = _merge_runs(docs, pos, 3)
    assert list(docs[starts_at]) == [0, 0, 1]
    assert list(s) == [0, 9, 0]
    assert list(e) == [8, 12, 3]


def test_cross_document_duplicate_span(ray_session):
    shared = "the quick brown fox jumps"
    ds = _ds([
        (1, f"alpha beta {shared} gamma"),
        (2, f"{shared} delta epsilon zeta"),
        (3, "entirely different words here okay"),
    ])
    df = _spans_df(ds, ngram_size=5)
    # doc 1 tokens: alpha beta the quick brown fox jumps gamma -> [2,7)
    # doc 2 tokens: the quick brown fox jumps delta ... -> [0,5)
    assert df.values.tolist() == [[1, 2, 7], [2, 0, 5]]


def test_self_repetition_counts_as_duplication(ray_session):
    ds = _ds([(1, "a b c d a b c d x y")])
    df = _spans_df(ds, ngram_size=4)
    # "a b c d" occurs twice inside the one document; the two
    # touching windows [0,4) and [4,8) merge into one span
    assert df.values.tolist() == [[1, 0, 8]]


def test_short_docs_contribute_no_windows(ray_session):
    ds = _ds([(1, "a b c"), (2, "a b c"), (3, "")])
    assert duplicate_spans(ds, ngram_size=4).count() == 0
    # but at n=3 the identical short docs are one whole-doc span each
    df = _spans_df(ds, ngram_size=3)
    assert df.values.tolist() == [[1, 0, 3], [2, 0, 3]]


def test_matching_is_case_insensitive(ray_session):
    ds = _ds([(1, "The Quick Brown Fox tail"), (2, "the quick brown fox")])
    df = _spans_df(ds, ngram_size=4)
    assert df.values.tolist() == [[1, 0, 4], [2, 0, 4]]


def test_broadcast_and_join_paths_identical(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        toks = list(rng.choice(vocab, size=30))
        rows.append((i, " ".join(toks)))
    # plant shared spans
    shared = "p q r s t u v w"
    rows[5] = (5, rows[5][1] + " " + shared)
    rows[17] = (17, shared + " " + rows[17][1])
    ds = _ds(rows)
    a = _spans_df(ds, ngram_size=8)
    b = _spans_df(ds, ngram_size=8, max_broadcast_ngrams=1,
                  join_partitions=4)
    assert not a.empty
    pd.testing.assert_frame_equal(a, b)
    ra = remove_duplicate_spans(ds, ngram_size=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    rb = remove_duplicate_spans(ds, ngram_size=8, max_broadcast_ngrams=1,
                                join_partitions=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(ra, rb)


def test_removal_preserves_case_and_other_columns(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["Keep ME the quick brown fox",
                          "THE QUICK BROWN FOX and tail words"]),
        "lang": pa.array(["eng", "eng"]),
    }))
    out = remove_duplicate_spans(ds, ngram_size=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out.columns) == ["doc_id", "text", "lang"]
    assert out["text"].tolist() == ["Keep ME", "and tail words"]
    assert out["lang"].tolist() == ["eng", "eng"]


def test_removal_fully_covered_doc_becomes_empty(ray_session):
    ds = _ds([(1, "a b c d"), (2, "a b c d")])
    out = remove_duplicate_spans(ds, ngram_size=4).to_pandas()
    assert sorted(out["text"].tolist()) == ["", ""]


def test_removal_noop_without_duplicates(ray_session):
    ds = _ds([(1, "alpha beta gamma delta"), (2, "five six seven eight")])
    out = remove_duplicate_spans(ds, ngram_size=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["text"].tolist() == [
        "alpha beta gamma delta", "five six seven eight"]


# --- exact quantiles ---


def test_value_histogram(ray_session):
    ds = ray.data.from_items([{"v": x} for x in [3, 1, 3, 3, 2, None]])
    h = value_histogram(ds, "v").to_pandas().sort_values("value")
    assert h["value"].tolist() == [1, 2, 3]
    assert h["count"].tolist() == [1, 1, 3]


@pytest.mark.parametrize("qs", [[0.0, 0.25, 0.5, 0.75, 1.0],
                                [0.1, 0.33, 0.9, 0.99]])
def test_exact_quantiles_match_duckdb(ray_session, qs):
    import duckdb

    rng = np.random.default_rng(4)
    vals = rng.integers(0, 50, size=500).tolist()
    ds = ray.data.from_items([{"v": int(x)} for x in vals])
    got = exact_quantiles(ds, "v", qs).to_pydict()
    con = duckdb.connect()
    con.register("t", pa.table({"v": pa.array(vals, pa.int64())}))
    for q, v in zip(qs, got["value"]):
        (exp,) = con.execute(
            f"SELECT quantile_disc(v, {q}) FROM t").fetchone()
        assert v == exp, q
