"""Corpus vocabulary / n-gram stats and TF-IDF keyword extraction
(functions/vocab.py)."""

import math

import pyarrow as pa
import ray.data

from patapsco_ray.functions import tfidf_topk_terms, top_ngrams, vocab_stats


def _ds(rows, ids=None):
    return ray.data.from_arrow(pa.table({
        "doc_id": ids if ids is not None else list(range(len(rows))),
        "text": rows,
    }))


def test_top_ngrams_counts_every_occurrence(ray_session):
    ds = _ds([
        "the cat sat on the cat",   # "the cat" x2
        "the cat ran",              # "the cat" x1
        "a dog a dog a dog",        # "a dog" x3, "dog a" x2
        "",                         # no windows
        "single",                   # < n tokens: no windows
    ])
    got = {r["ngram"]: r["n_occurrences"]
           for r in top_ngrams(ds, n=2, k=10, min_count=2).take_all()}
    assert got["the cat"] == 3
    assert got["a dog"] == 3
    assert got["dog a"] == 2
    # min_count=2 drops singletons like "cat sat"
    assert "cat sat" not in got


def test_top_ngrams_k_and_tiebreak(ray_session):
    # three bigrams with count 2; k=2 keeps the lexicographically
    # smallest two (count desc, ngram asc)
    ds = _ds(["x y x y", "b c b c", "a q a q"])
    rows = top_ngrams(ds, n=2, k=2, min_count=2).take_all()
    assert [r["ngram"] for r in rows] == ["a q", "b c"]


def test_top_ngrams_windows_stay_within_documents(ray_session):
    # no bigram spans the boundary between two docs in one batch
    ds = _ds(["alpha beta", "beta alpha"])
    got = {r["ngram"] for r in
           top_ngrams(ds, n=2, k=10, min_count=1).take_all()}
    assert got == {"alpha beta", "beta alpha"}


def test_tfidf_topk_terms_ranks_and_scores(ray_session):
    # 4 docs; "common" appears in all -> idf 0; rarer terms rank higher
    ds = _ds([
        "common apple apple banana",
        "common banana",
        "common cherry",
        "common",
    ])
    out = tfidf_topk_terms(ds, k=2).take_all()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    q = lambda df: int(math.floor(math.log(4 / df) * 1_000_000 + 0.5))
    # doc 0: apple tf=2 df=1 -> 2*q(1); banana tf=1 df=2 -> q(2)
    d0 = sorted(by_doc[0], key=lambda r: r["rank"])
    assert [r["term"] for r in d0] == ["apple", "banana"]
    assert d0[0]["tfidf_q"] == 2 * q(1)
    assert d0[1]["tfidf_q"] == q(2)
    # doc 3 has only "common" (idf 0 -> score 0) but still ranks it
    d3 = sorted(by_doc[3], key=lambda r: r["rank"])
    assert [r["term"] for r in d3] == ["common"]
    assert d3[0]["tfidf_q"] == 0
    # ties broken by term ascending
    d2 = sorted(by_doc[2], key=lambda r: r["rank"])
    assert [r["term"] for r in d2] == ["cherry", "common"]


def test_tfidf_topk_skips_empty_docs(ray_session):
    ds = _ds(["alpha beta", "", "   "])
    out = tfidf_topk_terms(ds, k=3).take_all()
    assert {r["doc_id"] for r in out} == {0}


def test_vocab_stats(ray_session):
    t = vocab_stats(_ds(["a b b c", "c d", ""]))
    row = t.to_pylist()[0]
    # terms: a(1) b(2) c(2) d(1) -> 4 terms, 6 tokens, 2 hapax, max 2
    assert row == {"n_terms": 4, "n_tokens": 6, "n_hapax": 2, "max_cf": 2}


def test_vocab_stats_empty_corpus(ray_session):
    t = vocab_stats(_ds(["", "  "]))
    row = t.to_pylist()[0]
    assert row == {"n_terms": 0, "n_tokens": 0, "n_hapax": 0, "max_cf": 0}


# ---- property fuzz vs brute-force references ----

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="ab ", min_size=0, max_size=12)
_corpus = st.lists(_word, min_size=1, max_size=12)


def _brute_ngrams(texts, n):
    c = Counter()
    for t in texts:
        toks = [w for w in t.lower().split(" ") if w]
        for i in range(len(toks) - n + 1):
            c[" ".join(toks[i:i + n])] += 1
    return c


@given(_corpus)
@settings(max_examples=25, deadline=None)
def test_top_ngrams_matches_bruteforce(ray_session, texts):
    want = _brute_ngrams(texts, 2)
    got = {r["ngram"]: r["n_occurrences"] for r in
           top_ngrams(_ds(texts), n=2, k=1000, min_count=1).take_all()}
    assert got == dict(want)


def _brute_tfidf(texts, k):
    docs = [[w for w in t.lower().split(" ") if w] for t in texts]
    n = len(docs)
    df = Counter()
    for d in docs:
        df.update(set(d))
    q = {t: int(math.floor(math.log(n / v) * 1_000_000 + 0.5))
         for t, v in df.items()}
    out = set()
    for i, d in enumerate(docs):
        tf = Counter(d)
        ranked = sorted(tf.items(), key=lambda kv: (-kv[1] * q[kv[0]], kv[0]))
        for r, (t, f) in enumerate(ranked[:k]):
            out.add((i, t, r, f * q[t]))
    return out


@given(_corpus)
@settings(max_examples=25, deadline=None)
def test_tfidf_matches_bruteforce(ray_session, texts):
    got = {(r["doc_id"], r["term"], r["rank"], r["tfidf_q"]) for r in
           tfidf_topk_terms(_ds(texts), k=3).take_all()}
    assert got == _brute_tfidf(texts, 3)


def test_tfidf_min_df_trims_model_but_keeps_semantics(ray_session):
    # min_df=2 drops df-1 terms from the broadcast model: they score 0
    # and lose to any df>=2 term, but still fill empty slots by term
    ds = _ds(["rare1 shared", "shared common", "common other"])
    out = tfidf_topk_terms(ds, k=1, min_df=2).take_all()
    by_doc = {r["doc_id"]: r for r in out}
    # doc 0: "rare1" (df=1, trimmed -> 0) loses to "shared" (df=2)
    assert by_doc[0]["term"] == "shared" and by_doc[0]["tfidf_q"] > 0


def test_tfidf_join_path_matches_broadcast(ray_session):
    # force the distributed join path (broadcast_max_terms=0) and
    # require row-identical output vs the broadcast-dict path —
    # includes idf-0 terms, ties, empty docs, and min_df trimming
    import random

    rng = random.Random(17)
    vocab = [f"w{i:03d}" for i in range(60)]
    texts = [" ".join(rng.choices(vocab, k=rng.randrange(0, 25)))
             for _ in range(80)] + ["", "   "]
    ds = _ds(texts).repartition(6)
    for kwargs in ({"k": 3}, {"k": 2, "min_df": 3}):
        want = {(r["doc_id"], r["term"], r["rank"], r["tfidf_q"])
                for r in tfidf_topk_terms(ds, **kwargs).take_all()}
        got_rows = tfidf_topk_terms(
            ds, broadcast_max_terms=0, join_partitions=4,
            rank_partitions=8, **kwargs).take_all()
        got = {(r["doc_id"], r["term"], r["rank"], r["tfidf_q"])
               for r in got_rows}
        assert len(got_rows) == len(got)  # no duplicate rows
        assert got == want
