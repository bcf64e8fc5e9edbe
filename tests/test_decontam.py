"""Benchmark decontamination (functions/decontam.py)."""

import pyarrow as pa
import pytest

import ray.data

from patapsco_ray.functions import decontaminate, ngram_contamination


@pytest.fixture()
def corpus(ray_session):
    return ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "the quick brown fox jumps over the lazy dog",   # clean
            "alpha beta gamma delta epsilon zeta eta",       # = probe
            "one two three alpha beta gamma delta end",      # partial hit
            "tiny doc",                                      # short, clean
            "",                                              # token-less
        ],
    }))


@pytest.fixture()
def probes(ray_session):
    return ray.data.from_arrow(pa.table({
        "doc_id": [100],
        "text": ["alpha beta gamma delta epsilon zeta eta"],
    }))


def test_contamination_counts(corpus, probes):
    got = ngram_contamination(corpus, probes, ngram_size=4).to_pandas() \
        .set_index("doc_id").sort_index()
    # doc 2 is the probe itself: all 4 of its 4-grams match
    assert got.loc[2, "n_matched"] == 4 and got.loc[2, "n_ngrams"] == 4
    # doc 3 shares exactly one 4-gram ("alpha beta gamma delta")
    assert got.loc[3, "n_matched"] == 1 and got.loc[3, "n_ngrams"] == 5
    assert got.loc[1, "n_matched"] == 0
    assert got.loc[4, "n_matched"] == 0 and got.loc[4, "n_ngrams"] == 1
    assert got.loc[5, "n_matched"] == 0 and got.loc[5, "n_ngrams"] == 0


def test_decontaminate_filters_with_all_columns(corpus, probes):
    kept = decontaminate(corpus, probes, ngram_size=4).to_pandas()
    assert sorted(kept["doc_id"]) == [1, 4, 5]
    assert set(kept.columns) == {"doc_id", "text"}
    # a higher bar keeps the one-hit doc
    kept2 = decontaminate(corpus, probes, ngram_size=4,
                          min_matches=2).to_pandas()
    assert sorted(kept2["doc_id"]) == [1, 3, 4, 5]


def test_short_probe_whole_doc_ngram(ray_session):
    """Probes shorter than the n-gram size contribute their whole
    token sequence — matching the dedup family convention."""
    docs = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2], "text": ["tiny doc", "tiny doc here"]}))
    probes = ray.data.from_arrow(pa.table({
        "doc_id": [9], "text": ["tiny doc"]}))
    got = ngram_contamination(docs, probes, ngram_size=4).to_pandas() \
        .set_index("doc_id")
    assert got.loc[1, "n_matched"] == 1   # whole-doc == whole-probe
    assert got.loc[2, "n_matched"] == 0   # different whole-doc 3-gram


def test_probe_cap_raises(corpus, probes):
    with pytest.raises(ValueError, match="max_probe_ngrams"):
        ngram_contamination(corpus, probes, ngram_size=4,
                            max_probe_ngrams=2)


def test_case_and_whitespace_normalized(ray_session):
    docs = ray.data.from_arrow(pa.table({
        "doc_id": [1], "text": ["Alpha BETA gamma delta"]}))
    probes = ray.data.from_arrow(pa.table({
        "doc_id": [9], "text": ["alpha beta gamma delta"]}))
    got = ngram_contamination(docs, probes, ngram_size=4).to_pandas()
    assert got["n_matched"].tolist() == [1]
