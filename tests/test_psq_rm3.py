"""PSQ golden-score conformance (reference tests/test_psq.py) and RM3
expansion behavior."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from patapsco_ray.index import build_index
from patapsco_ray.search import (
    IndexSearcher,
    PSQGenerator,
    normalize_psq_entry,
    parse_psq_query,
    parse_psq_table,
    rm3_expand,
    search_rm3,
)
from patapsco_ray.stages import write_doc_store
from patapsco_ray.text import TextConfig, TextProcessor

# the reference's 4-doc PSQ corpus (tests/test_psq.py:22-35)
PSQ_DOCS = [
    ("1", "gato felino"),
    ("2", "gato and some extra words gato"),
    ("3", "felino"),
    ("4", "gato"),
]
PSQ_QUERY = "psq AND (gato^0.8 felino^0.2) AND (extra^0.9 words^0.1)"


@pytest.fixture(scope="module")
def psq_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("psq")
    pq.write_table(
        pa.table({"doc_id": [i for i, _ in PSQ_DOCS],
                  "text": [t for _, t in PSQ_DOCS]}),
        d / "docs.parquet",
    )
    idx = d / "index"
    build_index(
        str(d / "docs.parquet"), idx,
        text_config=TextConfig(stopwords=False, stem=False, lowercase=True),
        id_column="doc_id", html_column=None,
    )
    return str(idx)


def test_psq_golden_scores(psq_index):
    """Reference golden: top doc '2', 0.5117189 @ k1=1.2,b=0.75 and
    0.270769 @ k1=5,b=0.1 (tests/test_psq.py:38-67)."""
    s = IndexSearcher(psq_index, k1=1.2, b=0.75)
    hits = s.search_psq(PSQ_QUERY, k=10)
    assert len(hits) == 4
    assert hits[0]["doc_id"] == "2"
    assert hits[0]["score"] == pytest.approx(0.5117189, rel=1e-5)

    s2 = IndexSearcher(psq_index, k1=5, b=0.1)
    hits2 = s2.search_psq(PSQ_QUERY, k=10)
    assert hits2[0]["doc_id"] == "2"
    assert hits2[0]["score"] == pytest.approx(0.270769, rel=1e-5)


def test_parse_psq_query():
    clauses = parse_psq_query(PSQ_QUERY)
    assert clauses == [[("gato", 0.8), ("felino", 0.2)],
                       [("extra", 0.9), ("words", 0.1)]]


def test_normalize_psq_entry():
    # probs renormalize to sum 1 and truncate at cumulative threshold
    entry = normalize_psq_entry(
        {"a": 0.8, "b": 0.15, "c": 0.04, "d": 0.01}, cum_thresh=0.97)
    assert set(entry) == {"a", "b", "c"}
    assert sum(entry.values()) == pytest.approx(1.0)
    # reference util/formats.py:113-130: tiny probs dropped
    e2 = normalize_psq_entry({"a": 1.0, "b": 1e-9})
    assert set(e2) == {"a"}


def test_psq_table_and_generator(tmp_path):
    table_path = tmp_path / "psq.json"
    table_path.write_text(
        '{"cat": {"gato": 0.8, "felino": 0.15},'
        ' "the": {"el": 0.9, "la": 0.1}}'
    )
    table = parse_psq_table(table_path)
    assert table["cat"]["gato"] == pytest.approx(0.8 / 0.95)
    proc = TextProcessor(TextConfig(stopwords=False, stem=False))
    gen = PSQGenerator(proc, table)
    clauses = gen.generate("cat extra")
    # translated clause + passthrough clause
    assert clauses[0][0][0] == "gato"
    assert clauses[1] == [("extra", 1.0)]
    qs = gen.to_query_string(clauses)
    assert qs.startswith("psq AND (gato^0.8421")


def test_rm3_expansion(ray_session, tmp_path_factory, psq_index):
    d = tmp_path_factory.mktemp("rm3store")
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [i for i, _ in PSQ_DOCS],
        "text": [t for _, t in PSQ_DOCS],
    }))
    write_doc_store(ds, d / "store", num_buckets=2)
    from patapsco_ray.stages import DocStore
    s = IndexSearcher(psq_index)
    store = DocStore(d / "store")
    weights = rm3_expand(s, store, "gato", fb_terms=3, fb_docs=2,
                         original_query_weight=0.5)
    # original term keeps at least its interpolated weight
    assert weights["gato"] >= 0.5
    # expansion pulls in co-occurring terms from the feedback docs
    assert any(t != "gato" for t in weights)
    assert sum(weights.values()) == pytest.approx(1.0, abs=1e-6)
    hits = search_rm3(s, store, "gato", k=4)
    assert hits and hits[0]["rank"] == 0


def test_rm3_empty_query(ray_session, psq_index, tmp_path_factory):
    from patapsco_ray.stages import DocStore
    d = tmp_path_factory.mktemp("rm3store2")
    ds = ray.data.from_arrow(pa.table({"doc_id": ["1"], "text": ["x"]}))
    write_doc_store(ds, d / "store", num_buckets=1)
    s = IndexSearcher(psq_index)
    assert search_rm3(s, DocStore(d / "store"), "", k=5) == []


def test_psq_requires_bm25(psq_index):
    """ADVICE r1: retrieve.name=qld + psq must be a clear config error,
    not an AttributeError deep in scoring."""
    s = IndexSearcher(psq_index, scorer="qld")
    with pytest.raises(ValueError, match="bm25"):
        s.search_psq("psq AND (cat^0.7 dog^0.3)")
