"""PII scrub, training chunking, repetition signals
(functions/pii.py, chunking.py, textstats.repetition_signals)."""

import pyarrow as pa
import pytest
import ray.data

from patapsco_ray.functions import (
    chunk_documents,
    pii_counts,
    redact_pii,
    repetition_signals,
)


def _ds(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(rows))),
        "text": rows,
    }))


def test_pii_counts_and_redact(ray_session):
    rows = [
        "mail me at jane.doe+x@example.co.uk today",
        "call +1 555-123-4567 or 12 345-678-9012 now",
        "server at 192.168.0.1 and 10.0.0.255",
        "ssn 123-45-6789 leaked",
        "clean text with no pii at all",
    ]
    got = pii_counts(_ds(rows)).to_pandas().set_index("doc_id")
    assert got.loc[0, "n_email"] == 1
    assert got.loc[1, "n_phone"] == 2
    assert got.loc[2, "n_ipv4"] == 2
    assert got.loc[3, "n_ssn"] == 1
    assert (got.loc[4] == 0).all()
    red = redact_pii(_ds(rows)).to_pandas().set_index("doc_id")
    assert red.loc[0, "text"] == "mail me at [EMAIL] today"
    assert red.loc[1, "text"] == "call [PHONE] or [PHONE] now"
    assert red.loc[2, "text"] == "server at [IP] and [IP]"
    assert red.loc[3, "text"] == "ssn [SSN] leaked"
    assert red.loc[4, "text"] == rows[4]


def test_chunk_documents(ray_session):
    toks = [f"w{i}" for i in range(10)]
    ds = _ds([" ".join(toks), "a b", "", "  double  spaced  "])
    got = chunk_documents(ds, chunk_size=4, overlap=1).to_pandas()
    d0 = got[got.doc_id == 0].sort_values("chunk_index")
    # stride 3, 10 tokens -> starts 0,3,6,9
    assert d0["start_token"].tolist() == [0, 3, 6, 9]
    assert d0["n_tokens"].tolist() == [4, 4, 4, 1]
    assert d0["chunk_text"].tolist() == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9", "w9"]
    d1 = got[got.doc_id == 1]
    assert d1["chunk_text"].tolist() == ["a b"]
    assert (got.doc_id != 2).all()  # empty doc: no chunks
    d3 = got[got.doc_id == 3]
    assert d3["chunk_text"].tolist() == ["double spaced"]  # empties dropped
    # layout-only mode
    lo = chunk_documents(ds, chunk_size=4, overlap=1,
                         include_text=False).to_pandas()
    assert "chunk_text" not in lo.columns and len(lo) == len(got)
    with pytest.raises(ValueError):
        chunk_documents(ds, chunk_size=4, overlap=4)


def test_repetition_signals(ray_session):
    ds = _ds([
        "a a a a",             # top_frac 1.0; bigrams aa,aa,aa dup 2/3
        "a b c d",             # all distinct
        "",                    # empty
        "solo",                # 1 token, no bigram
        "x y x y x y",         # bigrams: xy yx xy yx xy -> 5 pos 2 distinct
    ])
    got = repetition_signals(ds).to_pandas().set_index("doc_id")
    assert got.loc[0, "n_tokens"] == 4
    assert got.loc[0, "top_token_frac_1e6"] == 1_000_000
    assert got.loc[0, "dup_ngram_frac_1e6"] == 666_667
    assert got.loc[1, "top_token_frac_1e6"] == 250_000
    assert got.loc[1, "dup_ngram_frac_1e6"] == 0
    assert (got.loc[2] == 0).all()
    assert got.loc[3, "n_tokens"] == 1
    assert got.loc[3, "top_token_frac_1e6"] == 1_000_000
    assert got.loc[3, "dup_ngram_frac_1e6"] == 0
    assert got.loc[4, "dup_ngram_frac_1e6"] == 600_000


def test_sample_by_hash(ray_session):
    import numpy as np

    from patapsco_ray.functions import sample_by_hash

    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(2000)),
        "text": ["x"] * 2000,
    }))
    s35 = sample_by_hash(ds, rate=0.35, seed=9).to_pandas()
    # deterministic: same inputs -> same set
    again = sample_by_hash(ds, rate=0.35, seed=9).to_pandas()
    assert s35["doc_id"].tolist() == again["doc_id"].tolist()
    # rate ~ observed fraction (binomial, 2000 trials)
    assert 0.30 < len(s35) / 2000 < 0.40
    # nested: lower rate with same seed is a subset
    s10 = sample_by_hash(ds, rate=0.10, seed=9).to_pandas()
    assert set(s10["doc_id"]) <= set(s35["doc_id"])
    # different seed -> roughly independent selection
    other = sample_by_hash(ds, rate=0.35, seed=10).to_pandas()
    inter = len(set(other["doc_id"]) & set(s35["doc_id"])) / 2000
    assert 0.06 < inter < 0.20  # ~0.35^2 = 0.1225
    # rate edges
    assert len(sample_by_hash(ds, rate=0.0, seed=1).to_pandas()) == 0
    assert len(sample_by_hash(ds, rate=1.0, seed=1).to_pandas()) == 2000
    # string keys route through the stable string hash
    sds = ray.data.from_arrow(pa.table({
        "doc_id": [f"u{i}" for i in range(1000)]}))
    st = sample_by_hash(sds, rate=0.5, seed=3).to_pandas()
    assert 0.43 < len(st) / 1000 < 0.57
    with pytest.raises(ValueError):
        sample_by_hash(ds, rate=1.5)


def test_splitmix64_sql_bit_exact():
    import duckdb
    import numpy as np

    from patapsco_ray.functions.hashing import splitmix64
    from patapsco_ray.functions.sampling import splitmix64_sql

    keys = np.array([0, 1, 42, 499, 2**31, 2**62, 2**63 - 1],
                    dtype=np.uint64)
    want = splitmix64(keys)
    con = duckdb.connect()
    got = con.execute(
        f"SELECT CAST({splitmix64_sql('k')} AS UBIGINT) "
        "FROM (SELECT unnest(?) AS k)",
        [[int(x) for x in keys]]).fetchall()
    assert (np.array([g[0] for g in got], dtype=np.uint64) == want).all()
