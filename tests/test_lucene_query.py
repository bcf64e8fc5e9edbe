"""Boolean/boost query subset (LuceneQueryGenerator parity surface)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from patapsco_ray.index import build_index
from patapsco_ray.search import IndexSearcher, parse_lucene_query, search_lucene
from patapsco_ray.text import TextConfig, TextProcessor

DOCS = [
    ("1", "apple banana cherry"),
    ("2", "apple banana"),
    ("3", "banana cherry"),
    ("4", "apple apple apple"),
    ("5", "durian"),
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("lq")
    pq.write_table(pa.table({"doc_id": [i for i, _ in DOCS],
                             "text": [t for _, t in DOCS]}),
                   d / "docs.parquet")
    build_index(str(d / "docs.parquet"), d / "idx",
                text_config=TextConfig(stopwords=False, stem=False),
                id_column="doc_id", html_column=None)
    return str(d / "idx")


def test_parse_terms():
    proc = TextProcessor(TextConfig(stopwords=False, stem=False))
    qts = parse_lucene_query("apple^2 +banana -cherry", proc)
    assert [(q.term, q.boost, q.required, q.prohibited) for q in qts] == [
        ("apple", 2.0, False, False),
        ("banana", 1.0, True, False),
        ("cherry", 1.0, False, True),
    ]
    from patapsco_ray.search.luceneq import QueryGroup, QueryPhrase

    root = parse_lucene_query('"a phrase"^3 -"bad one" apple', proc)
    assert isinstance(root, QueryGroup)
    ph, neg, term = root.children
    assert isinstance(ph, QueryPhrase) and ph.terms == ("a", "phrase")
    assert ph.boost == 3.0 and not ph.prohibited
    assert isinstance(neg, QueryPhrase) and neg.prohibited
    assert term.term == "apple"
    # a one-word phrase collapses to a plain term (Lucene behavior)
    flat = parse_lucene_query('"apple" banana', proc)
    assert [q.term for q in flat] == ["apple", "banana"]


def test_or_default(idx):
    s = IndexSearcher(idx)
    hits = search_lucene(s, "apple cherry", k=10)
    assert {h["doc_id"] for h in hits} == {"1", "2", "3", "4"}


def test_and_required(idx):
    s = IndexSearcher(idx)
    hits = search_lucene(s, "apple AND cherry", k=10)
    assert {h["doc_id"] for h in hits} == {"1"}
    hits2 = search_lucene(s, "+apple +banana", k=10)
    assert {h["doc_id"] for h in hits2} == {"1", "2"}


def test_prohibited(idx):
    s = IndexSearcher(idx)
    hits = search_lucene(s, "apple -cherry", k=10)
    assert {h["doc_id"] for h in hits} == {"2", "4"}


def test_boost_changes_ranking(idx):
    s = IndexSearcher(idx)
    plain = search_lucene(s, "apple cherry", k=10)
    boosted = search_lucene(s, "apple cherry^10", k=10)
    # a huge cherry boost must rank a cherry-only doc above apple-rich 4
    pos = {h["doc_id"]: h["rank"] for h in boosted}
    assert pos["3"] < pos["4"]
    # boosted scores = boost * plain per-term contribution (doc 3 has
    # only cherry)
    plain3 = next(h["score"] for h in plain if h["doc_id"] == "3")
    boost3 = next(h["score"] for h in boosted if h["doc_id"] == "3")
    assert boost3 == pytest.approx(10 * plain3)


def test_phrase_and_missing_required_empty(idx):
    s = IndexSearcher(idx)
    assert search_lucene(s, '"apple banana"', k=10) == []
    assert search_lucene(s, "+nonexistentterm apple", k=10) == []


# ------------------------- nested grouping (reference topics.py:362-414)


def test_parse_nested_group():
    from patapsco_ray.search.luceneq import QueryGroup

    proc = TextProcessor(TextConfig(stopwords=False, stem=False))
    root = parse_lucene_query("(apple banana)^2 -cherry", proc)
    assert isinstance(root, QueryGroup)
    grp, neg = root.children
    assert isinstance(grp, QueryGroup) and grp.boost == 2.0
    assert [c.term for c in grp.children] == ["apple", "banana"]
    assert neg.term == "cherry" and neg.prohibited


def test_contents_field_prefix():
    """The reference generator emits '+contents:term' strings
    (topics.py:392,407) — accepted transparently."""
    proc = TextProcessor(TextConfig(stopwords=False, stem=False))
    qts = parse_lucene_query("+contents:apple contents:banana^2", proc)
    assert [(q.term, q.boost, q.required) for q in qts] == [
        ("apple", 1.0, True), ("banana", 2.0, False)]


def test_group_and_required(idx):
    s = IndexSearcher(idx)
    hits = search_lucene(s, "(apple OR cherry) AND banana", k=10)
    assert {h["doc_id"] for h in hits} == {"1", "2", "3"}


def test_required_group_with_exclusion(idx):
    s = IndexSearcher(idx)
    hits = search_lucene(s, "+(apple cherry) -banana", k=10)
    assert {h["doc_id"] for h in hits} == {"4"}


def test_group_boost_composes(idx):
    s = IndexSearcher(idx)
    plain = {h["doc_id"]: h["score"]
             for h in search_lucene(s, "cherry", k=10)}
    nested = {h["doc_id"]: h["score"]
              for h in search_lucene(s, "((cherry^2))^3", k=10)}
    assert set(nested) == set(plain)
    for d, sc in nested.items():
        assert sc == pytest.approx(6 * plain[d])


def test_nonmatching_group_contributes_nothing(idx):
    """Lucene per-clause gating: a term inside a group that does NOT
    match a document adds no score even when the document contains
    the term — and a document matching no top-level clause is not a
    hit at all."""
    s = IndexSearcher(idx)
    hits = search_lucene(s, "(apple -cherry) durian", k=10)
    # doc 1 contains apple but the group excludes cherry-docs, and it
    # has no durian -> not a hit
    assert {h["doc_id"] for h in hits} == {"2", "4", "5"}
    apple_only = {h["doc_id"]: h["score"]
                  for h in search_lucene(s, "apple", k=10)}
    got2 = next(h["score"] for h in hits if h["doc_id"] == "2")
    assert got2 == pytest.approx(apple_only["2"])


# --------- phrase clauses over a positional index (beyond-parity)


@pytest.fixture(scope="module")
def pidx(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("lqp")
    pq.write_table(pa.table({"doc_id": [i for i, _ in DOCS],
                             "text": [t for _, t in DOCS]}),
                   d / "docs.parquet")
    build_index(str(d / "docs.parquet"), d / "pidx",
                text_config=TextConfig(stopwords=False, stem=False),
                id_column="doc_id", html_column=None, positions=True)
    return str(d / "pidx")


def test_phrase_scores_on_positional_index(pidx):
    s = IndexSearcher(pidx)
    hits = search_lucene(s, '"apple banana"', k=10)
    # adjacency: docs 1 and 2 contain "apple banana"; 3/4/5 don't
    assert {h["doc_id"] for h in hits} == {"1", "2"}
    # a pure-phrase query scores identically to search_phrase
    direct = s.search_phrase("apple banana", k=10)
    assert [(h["doc_id"], round(h["score"], 9)) for h in hits] == \
        [(h["doc_id"], round(h["score"], 9)) for h in direct]


def test_phrase_composes_with_boolean(pidx):
    s = IndexSearcher(pidx)
    # phrase MUST + term MUST_NOT
    hits = search_lucene(s, '+"apple banana" -cherry', k=10)
    assert {h["doc_id"] for h in hits} == {"2"}
    # non-adjacent order matches nothing
    assert search_lucene(s, '"banana apple"', k=10) == []
    # boost multiplies the phrase contribution
    lo = search_lucene(s, '"apple banana"', k=10)
    hi = search_lucene(s, '"apple banana"^2', k=10)
    by = {h["doc_id"]: h["score"] for h in lo}
    for h in hi:
        assert abs(h["score"] - 2 * by[h["doc_id"]]) < 1e-9


def test_phrase_in_group_gates_scoring(pidx):
    s = IndexSearcher(pidx)
    # the group matches only docs with the phrase; apple's extra
    # contribution counts only inside matching docs
    hits = search_lucene(s, '+("apple banana" cherry)', k=10)
    assert {h["doc_id"] for h in hits} == {"1", "2", "3"}


def test_phrase_under_qld_raises_on_positional_index(pidx, idx):
    # the positional index CAN answer phrases — a non-bm25 scorer is a
    # misconfiguration and must be loud, not a silent []
    s = IndexSearcher(pidx, scorer="qld")
    with pytest.raises(ValueError, match="bm25"):
        search_lucene(s, '"apple banana"', k=10)
    # ...while the reference-parity DOCS_AND_FREQS case stays empty
    assert search_lucene(IndexSearcher(idx, scorer="qld"),
                         '"apple banana"', k=10) == []


def test_grouped_query_honors_deletes(ray_session, tmp_path):
    from patapsco_ray.index import delete_documents

    pq.write_table(pa.table({"doc_id": [i for i, _ in DOCS],
                             "text": [t for _, t in DOCS]}),
                   tmp_path / "docs.parquet")
    build_index(str(tmp_path / "docs.parquet"), tmp_path / "idx",
                text_config=TextConfig(stopwords=False, stem=False),
                id_column="doc_id", html_column=None, positions=True)
    ipath = str(tmp_path / "idx")
    s = IndexSearcher(ipath)
    for q in ["(apple OR cherry) AND banana", '"apple banana"']:
        assert "1" in {h["doc_id"] for h in search_lucene(s, q, k=10)}
    delete_documents(ipath, ["1"])
    s2 = IndexSearcher(ipath)
    for q in ["(apple OR cherry) AND banana", '"apple banana"']:
        got = {h["doc_id"] for h in search_lucene(s2, q, k=10)}
        assert "1" not in got, f"tombstoned doc surfaced for {q!r}"
        assert "2" in got
