"""Tests for document processing, doc store, rerankers."""

import os
import stat

import pyarrow as pa
import pytest

import ray.data

from patapsco_ray.stages import (
    DocStore,
    MockReranker,
    ShellReranker,
    process_documents,
    rerank_results,
    write_doc_store,
)
from patapsco_ray.text import TextConfig


@pytest.fixture(scope="module")
def processed(ray_session, tmp_path_factory):
    tbl = pa.table({
        "url": [f"u{i}" for i in range(8)],
        "text": [
            "The  Quick   Brown fox", "jumps over the lazy dog",
            "a b c", "", "x" * 2_000_000, "stops the a an of",
            "hello world hello", "café food",
        ],
        "html": pa.array([None] * 8, pa.binary()),
    })
    ds = process_documents(
        ray.data.from_arrow(tbl),
        text_config=TextConfig(stopwords="lucene", stem="porter"),
        concurrency=1,
    )
    return ds.to_pandas().set_index("doc_id")


def test_process_documents(processed):
    # over-length doc rejected (reference docs.py:223: 1M char cap)
    assert "u4" not in processed.index
    assert len(processed) == 7
    # normalized original text: spaces collapsed, case preserved
    assert processed.loc["u0", "original_text"] == "The Quick Brown fox"
    # processed text: stopwords removed post-stem, lowercased
    assert processed.loc["u0", "text"] == "quick brown fox"
    assert processed.loc["u1", "text"] == "jump over lazi dog"
    # stopwords identified PRE-stem: "stops" is not a stopword so its
    # stem survives; "the a an of" are removed (docs.py:253-256 order)
    assert processed.loc["u5", "text"] == "stop"


@pytest.fixture(scope="module")
def store_path(ray_session, tmp_path_factory, processed):
    path = tmp_path_factory.mktemp("store") / "docs"
    ds = ray.data.from_pandas(processed.reset_index())
    write_doc_store(ds, path, num_buckets=4)
    return str(path)


def test_doc_store_lookup(store_path):
    store = DocStore(store_path)
    t = store.lookup(["u0", "u6", "nope"])
    got = dict(zip(t.column("doc_id").to_pylist(),
                   t.column("text").to_pylist()))
    assert got == {"u0": "quick brown fox", "u6": "hello world hello"}
    assert store.get("u1")["original_text"] == "jumps over the lazy dog"
    assert store.get("missing") is None


@pytest.fixture
def results_ds(ray_session):
    return ray.data.from_arrow(pa.table({
        "query_id": ["q1", "q1", "q2"],
        "doc_id": ["u0", "u6", "u1"],
        "rank": pa.array([0, 1, 0], pa.int32()),
        "score": [2.0, 1.0, 3.0],
    }))


def test_mock_reranker(store_path, results_ds):
    out = rerank_results(
        results_ds, MockReranker,
        constructor_kwargs={"store_path": store_path}, concurrency=1,
    ).to_pandas()
    assert len(out) == 3
    assert set(out["doc_id"]) == {"u0", "u6", "u1"}


def test_mock_reranker_missing_doc(store_path, ray_session):
    bad = ray.data.from_arrow(pa.table({
        "query_id": ["q1"], "doc_id": ["ghost"],
        "rank": pa.array([0], pa.int32()), "score": [1.0],
    }))
    with pytest.raises(Exception):
        rerank_results(
            bad, MockReranker,
            constructor_kwargs={"store_path": store_path}, concurrency=1,
        ).to_pandas()


def test_shell_reranker(store_path, results_ds, tmp_path):
    # script that reverses each query's ranking and doubles scores
    script = tmp_path / "rerank.py"
    script.write_text(
        "#!/usr/bin/env python\n"
        "import json, sys, collections\n"
        "doc_lang, query_lang, db, inp, out = sys.argv[1:6]\n"
        "assert '--weight' in sys.argv and '2' in sys.argv\n"
        "rows = [json.loads(l) for l in open(inp)]\n"
        "assert all(r['text'] for r in rows)\n"
        "byq = collections.defaultdict(list)\n"
        "for r in rows: byq[r['query_id']].append(r)\n"
        "with open(out, 'w') as fp:\n"
        "    for q, rs in byq.items():\n"
        "        for rank, r in enumerate(reversed(rs)):\n"
        "            fp.write(f\"{q} Q0 {r['doc_id']} {rank} "
        "{r['score']*2} sys\\n\")\n"
    )
    os.chmod(script, os.stat(script).st_mode | stat.S_IEXEC)
    out = rerank_results(
        results_ds, ShellReranker,
        constructor_kwargs={
            "store_path": store_path,
            "script": str(script),
            "extra_args": {"weight": 2},
        },
        concurrency=1,
    ).to_pandas()
    q1 = out[out["query_id"] == "q1"].sort_values("rank")
    assert q1["doc_id"].tolist() == ["u6", "u0"]  # reversed
    assert q1["score"].tolist() == [2.0, 4.0]


def test_doc_store_default_buckets_no_silent_miss(ray_session, tmp_path):
    """ADVICE r1: with the default 64 buckets and a small corpus many
    buckets are empty; the modulus must come from store metadata, not
    max(populated bucket)+1, or lookups silently miss documents."""
    ids = [f"doc-{i}" for i in range(50)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": ids, "text": [f"text {i}" for i in range(50)],
    }))
    path = tmp_path / "bigstore"
    write_doc_store(ds, path)  # default num_buckets=64
    store = DocStore(path)
    assert store.num_buckets == 64
    t = store.lookup(ids)
    assert sorted(t.column("doc_id").to_pylist()) == sorted(ids)


def test_doc_store_meta_required(ray_session, tmp_path):
    ids = ["a", "b"]
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": ids}))
    path = tmp_path / "store"
    write_doc_store(ds, path, num_buckets=8)
    meta = path / "_store_meta.json"
    assert meta.exists()
    # tampered hash version fails loudly instead of misrouting
    import json
    doc = json.loads(meta.read_text())
    doc["hash"] = "other-algo-v0"
    meta.write_text(json.dumps(doc))
    with pytest.raises(ValueError, match="hash"):
        DocStore(path)
    # no meta + no explicit modulus refuses to guess
    meta.unlink()
    with pytest.raises(FileNotFoundError, match="num_buckets"):
        DocStore(path)
    # explicit modulus still works without meta
    store = DocStore(path, num_buckets=8)
    assert sorted(store.lookup(ids).column("doc_id").to_pylist()) == ids


def test_stable_hash_strings_golden():
    """Pinned outputs: the bucket-routing hash is persisted on disk, so
    any algorithm change must be caught (bump HASH_VERSION)."""
    import numpy as np
    from patapsco_ray.functions.hashing import stable_hash_strings
    h = stable_hash_strings(pa.array(["", "a", "doc-42", "héllo wörld"]))
    assert h.dtype == np.uint64
    assert h.tolist() == [
        7960286522194355700, 8383303738522507310,
        5827168639349437504, 16427943038149904659,
    ]
    # independent of batch composition (padding width must not leak in)
    assert stable_hash_strings(pa.array(["a"])).tolist() == [h[1]]
    # slice/chunk invariance (buffer offsets must be honored)
    arr = pa.chunked_array([pa.array(["x", ""]), pa.array(["a", "doc-42"])])
    assert (stable_hash_strings(arr)[2:] == h[1:3]).all()
