"""stratified_sample + unigram_logprob unit tests."""

import math

import pyarrow as pa
import pytest

import ray.data

from patapsco_ray.functions import (
    sample_by_hash,
    stratified_sample,
    unigram_corpus_stats,
    unigram_logprob,
)


def _docs(n=400):
    langs = ["en", "de", "fr", "xx"]
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array([langs[i % 4] for i in range(n)], pa.string()),
    }))


def _ids(ds):
    return sorted(r["doc_id"] for r in ds.take_all())


def test_stratified_rates_and_default(ray_session):
    ds = _docs()
    out = stratified_sample(
        ds, rates={"en": 1.0, "de": 0.0}, default_rate=0.5, seed=3)
    rows = out.take_all()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert len(by_lang.get("en", [])) == 100      # rate 1.0 keeps all
    assert "de" not in by_lang                    # rate 0.0 drops all
    # fr + xx fall to the 0.5 default: roughly half, deterministic
    n_def = len(by_lang.get("fr", [])) + len(by_lang.get("xx", []))
    assert 60 <= n_def <= 140
    assert _ids(out) == _ids(stratified_sample(
        ds, rates={"en": 1.0, "de": 0.0}, default_rate=0.5, seed=3))


def test_stratified_nested_subsets(ray_session):
    ds = _docs()
    lo = set(_ids(stratified_sample(ds, rates={"en": 0.2}, seed=7)))
    hi = set(_ids(stratified_sample(ds, rates={"en": 0.6}, seed=7)))
    assert lo <= hi  # raising a rate strictly grows the stratum sample


def test_stratified_uniform_matches_sample_by_hash(ray_session):
    ds = _docs()
    uni = _ids(sample_by_hash(ds, rate=0.4, seed=11))
    strat = _ids(stratified_sample(
        ds, rates={}, default_rate=0.4, seed=11))
    assert uni == strat


def test_stratified_string_keys(ray_session):
    tbl = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(200)], pa.string()),
        "lang": pa.array(["en", "de"] * 100, pa.string()),
    })
    out = stratified_sample(
        ray.data.from_arrow(tbl), rates={"en": 1.0, "de": 0.0})
    rows = out.take_all()
    assert len(rows) == 100 and all(r["lang"] == "en" for r in rows)


def _corpus():
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b a", "b c", ""], pa.string()),
    }))


def test_unigram_corpus_stats(ray_session):
    cf, total = unigram_corpus_stats(_corpus())
    assert cf == {"a": 2, "b": 2, "c": 1} and total == 5


def test_unigram_logprob_values(ray_session):
    out = {r["doc_id"]: r for r in unigram_logprob(_corpus()).take_all()}
    q = lambda c: int(math.floor(math.log(c / 5) * 1_000_000 + 0.5))
    assert out[1]["n_tokens"] == 3
    assert out[1]["sum_logprob_q"] == 2 * q(2) + q(2)
    assert out[2]["sum_logprob_q"] == q(2) + q(1)
    assert out[3]["n_tokens"] == 0 and out[3]["sum_logprob_q"] == 0


def test_unigram_precomputed_stats(ray_session):
    # external model: unseen tokens contribute 0 (documented OOV)
    out = unigram_logprob(
        _corpus(), stats=({"a": 1}, 10)).take_all()
    q = int(math.floor(math.log(0.1) * 1_000_000 + 0.5))
    by = {r["doc_id"]: r["sum_logprob_q"] for r in out}
    assert by[1] == 2 * q and by[2] == 0


def test_unigram_join_path_matches_broadcast(ray_session):
    import random

    rng = random.Random(23)
    vocab = [f"t{i}" for i in range(40)]
    texts = [" ".join(rng.choices(vocab, k=rng.randrange(0, 30)))
             for _ in range(70)] + ["", "  "]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(5)
    want = sorted((r["doc_id"], r["n_tokens"], r["sum_logprob_q"])
                  for r in unigram_logprob(ds).take_all())
    got = sorted((r["doc_id"], r["n_tokens"], r["sum_logprob_q"])
                 for r in unigram_logprob(
                     ds, broadcast_max_terms=0, join_partitions=4,
                     agg_partitions=8).take_all())
    assert got == want
    assert len(got) == len(texts)  # zero-token docs present
