"""End-to-end config-driven runs (Runner) and distributed search."""

import json

import pyarrow as pa
import pytest

from patapsco_ray.index import build_index
from patapsco_ray.pipelines import run_pipeline
from patapsco_ray.results import read_trec_run
from patapsco_ray.search import (
    IndexSearcher,
    search_dataset,
    search_dataset_by_segment,
)
from patapsco_ray.sources import generate_webpages
from patapsco_ray.text import TextConfig


@pytest.fixture(scope="module")
def corpus_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("runner_corpus")
    generate_webpages(d, 1500, num_files=2)
    return str(d)


def test_runner_end_to_end(corpus_dir, tmp_path):
    qrels_path = tmp_path / "qrels.txt"
    run_path = tmp_path / "run1"
    config = {
        "run": {"name": "e2e", "path": str(run_path)},
        "documents": {"input": {"format": "parquet", "path": corpus_dir,
                                "lang": "eng"}},
        "text": {"stem": "porter"},
        "index": {"rows_per_segment": 600},
        "database": {"enabled": True},
        "queries": [["q1", "world state people"], ["q2", "work life year"]],
        "retrieve": {"name": "bm25", "number": 20},
        "rerank": {"name": "mock"},
    }
    out = run_pipeline(config)
    assert not out["resumed"]
    run = read_trec_run(out["results"])
    assert run.num_rows == 40
    assert set(run.column("query_id").to_pylist()) == {"q1", "q2"}
    # ranks contiguous from 0 per query
    q1 = run.filter(pa.compute.equal(run.column("query_id"), "q1"))
    assert q1.column("rank").to_pylist() == list(range(20))

    # scoring pass with qrels built from the run's own top docs
    top_doc = q1.column("doc_id")[0].as_py()
    qrels_path.write_text(f"q1 0 {top_doc} 1\nq2 0 nonexistent 1\n")
    config2 = dict(config)
    config2["run"] = {"name": "e2e", "path": str(tmp_path / "run2")}
    config2["score"] = {"qrels": str(qrels_path),
                        "metrics": ["map", "ndcg'", "recall@10"]}
    out2 = run_pipeline(config2)
    scores = (tmp_path / "run2" / "scores.txt").read_text()
    assert "map" in scores and "all" in scores

    # run-level resume: rerunning with existing results is a no-op
    out3 = run_pipeline(config)
    assert out3["resumed"]


def test_runner_jsonl_source_and_shuffle(tmp_path):
    docs = tmp_path / "docs.jsonl"
    docs.write_text("\n".join(
        json.dumps({"id": f"d{i}", "title": f"doc {i}",
                    "text": "alpha beta gamma " * (i + 1),
                    "date": "2020-01-01"})
        for i in range(20)
    ) + "\n")
    config = {
        "run": {"path": str(tmp_path / "run")},
        "documents": {"input": {"format": "jsonl", "path": str(docs)}},
        "index": {"strategy": "shuffle"},
        "queries": [["q1", "alpha beta"]],
        "retrieve": {"number": 5},
    }
    out = run_pipeline(config)
    run = read_trec_run(out["results"])
    assert run.num_rows == 5
    assert out["manifest"]["strategy"] == "shuffle"


@pytest.fixture(scope="module")
def small_index(corpus_dir, tmp_path_factory):
    idx = tmp_path_factory.mktemp("dist") / "idx"
    build_index(corpus_dir, idx, text_config=TextConfig(stem="porter"),
                rows_per_segment=500)
    return str(idx)


def test_search_dataset_matches_local(small_index):
    queries = pa.table({
        "query_id": ["a", "b"],
        "query": ["world state people", "work life year"],
    })
    dist = search_dataset(queries, small_index, k=10,
                          concurrency=2).to_pandas()
    local = IndexSearcher(small_index)
    for qid, qtext in zip(queries.column("query_id").to_pylist(),
                          queries.column("query").to_pylist()):
        want = [(h["doc_id"], h["rank"]) for h in local.search(qtext, k=10)]
        got = dist[dist["query_id"] == qid].sort_values("rank")
        assert list(zip(got["doc_id"], got["rank"])) == want


def test_search_by_segment_matches_local(small_index):
    queries = pa.table({
        "query_id": ["a", "b"],
        "query": ["world state people", "work life year"],
    })
    dist = search_dataset_by_segment(queries, small_index, k=10,
                                     concurrency=2).to_pandas()
    local = IndexSearcher(small_index)
    for qid, qtext in zip(queries.column("query_id").to_pylist(),
                          queries.column("query").to_pylist()):
        want = [(h["doc_id"], round(h["score"], 9))
                for h in local.search(qtext, k=10)]
        got = dist[dist["query_id"] == qid].sort_values("rank")
        assert [(d, round(s, 9)) for d, s in
                zip(got["doc_id"], got["score"])] == want


@pytest.fixture(scope="module")
def doc_store(corpus_dir, tmp_path_factory):
    import ray

    from patapsco_ray.stages import process_documents, write_doc_store

    store = tmp_path_factory.mktemp("dist_store") / "store"
    proc = process_documents(
        ray.data.read_parquet(corpus_dir),
        text_config=TextConfig(stem="porter"), id_column="url")
    write_doc_store(proc, store, num_buckets=4)
    return str(store)


def test_search_dataset_rm3_matches_driver_loop(small_index, doc_store):
    """mode='rm3' fans the two-pass feedback expansion out with the
    query partition; results must equal the single-process
    search_rm3 loop exactly."""
    from patapsco_ray.search.rm3 import search_rm3
    from patapsco_ray.stages import DocStore

    queries = pa.table({
        "query_id": ["a", "b"],
        "query": ["world state people", "work life year"],
    })
    dist = search_dataset(queries, small_index, k=10, mode="rm3",
                          doc_store_dir=doc_store,
                          concurrency=2).to_pandas()
    local = IndexSearcher(small_index)
    store = DocStore(doc_store)
    for qid, qtext in zip(queries.column("query_id").to_pylist(),
                          queries.column("query").to_pylist()):
        want = [(h["doc_id"], h["rank"], round(h["score"], 9))
                for h in search_rm3(local, store, qtext, k=10)]
        got = dist[dist["query_id"] == qid].sort_values("rank")
        assert [(d, r, round(s, 9)) for d, r, s in
                zip(got["doc_id"], got["rank"], got["score"])] == want


def test_search_dataset_psq_matches_local(small_index):
    """mode='psq': each query string is the reference PSQ clause
    syntax, scored with projected-statistics BM25 per actor."""
    q1 = "psq AND (world^0.7 state^0.3) AND (people^1.0)"
    q2 = "psq AND (work^0.5 life^0.5)"
    queries = pa.table({"query_id": ["p1", "p2"], "query": [q1, q2]})
    dist = search_dataset(queries, small_index, k=10, mode="psq",
                          concurrency=2).to_pandas()
    local = IndexSearcher(small_index)
    for qid, qtext in (("p1", q1), ("p2", q2)):
        want = [(h["doc_id"], h["rank"], round(h["score"], 9))
                for h in local.search_psq(qtext, k=10)]
        got = dist[dist["query_id"] == qid].sort_values("rank")
        assert [(d, r, round(s, 9)) for d, r, s in
                zip(got["doc_id"], got["rank"], got["score"])] == want


def test_search_dataset_rm3_requires_store(small_index):
    queries = pa.table({"query_id": ["a"], "query": ["world"]})
    with pytest.raises(Exception, match="doc_store_dir"):
        search_dataset(queries, small_index, mode="rm3",
                       concurrency=1).materialize()


def test_runner_topics_to_scores_clir_loop(corpus_dir, tmp_path):
    """Full reference-shaped run: JSONL topics -> field join -> retrieve
    -> TREC run -> qrels scoring, all through the config surface."""
    topics = tmp_path / "topics.jsonl"
    topics.write_text(
        '{"topic_id": "T1", "languages_with_qrels": ["eng"], "topics": '
        '[{"lang": "eng", "source": "original", "topic_title": '
        '"world state", "topic_description": "people and state"}]}\n'
        '{"topic_id": "T2", "languages_with_qrels": ["eng"], "topics": '
        '[{"lang": "eng", "source": "original", "topic_title": '
        '"work life", "topic_description": "year work"}]}\n'
    )
    out = run_pipeline({
        "run": {"path": str(tmp_path / "run")},
        "documents": {"input": {"format": "parquet", "path": corpus_dir,
                                "lang": "eng"}},
        "text": {"stem": "porter"},
        "topics": {"input": {"format": "jsonl", "path": str(topics),
                             "lang": "eng", "source": "original"},
                   "fields": "title+desc"},
        "retrieve": {"number": 10},
    })
    run = read_trec_run(out["results"])
    assert set(run.column("query_id").to_pylist()) == {"T1", "T2"}
    # score against qrels built from the run
    top = run.column("doc_id")[0].as_py()
    qrels = tmp_path / "qrels.txt"
    qrels.write_text(f"T1 0 {top} 1\nT2 0 {top} 0\n")
    out2 = run_pipeline({
        "run": {"path": str(tmp_path / "run2")},
        "documents": {"input": {"format": "parquet", "path": corpus_dir}},
        "text": {"stem": "porter"},
        "topics": {"input": {"format": "jsonl", "path": str(topics),
                             "lang": "eng", "source": "original"},
                   "fields": "title"},
        "retrieve": {"number": 10},
        "score": {"qrels": str(qrels),
                  "metrics": ["map", "ndcg'", "P@5", "recall@10"]},
    })
    text = (tmp_path / "run2" / "scores.txt").read_text()
    assert "ndcg_prime" in text and "\tall\t" in text
