"""Tests for TREC I/O, qrels and trec_eval-compatible metrics."""

import math

import pyarrow as pa
import pytest

from patapsco_ray.results import (
    evaluate,
    mean_scores,
    read_qrels,
    read_trec_run,
    results_to_trec_lines,
    write_scores_file,
    write_trec_run,
)


@pytest.fixture
def results_table():
    return pa.table({
        "query_id": ["q1", "q1", "q1", "q2"],
        "doc_id": ["d2", "d4", "d1", "d9"],
        "rank": pa.array([0, 1, 2, 0], pa.int32()),
        "score": [3.0, 2.0, 1.0, 5.5],
    })


def test_trec_lines_format(results_table):
    lines = results_to_trec_lines(results_table, system="sys1")
    assert lines.column("line")[0].as_py() == "q1 Q0 d2 0 3.0 sys1"


def test_trec_roundtrip(tmp_path, results_table):
    path = write_trec_run(results_table, tmp_path / "run.txt", system="s")
    back = read_trec_run(path)
    assert back.num_rows == 4
    assert back.column("query_id").to_pylist() == ["q1", "q1", "q1", "q2"]
    assert back.column("doc_id").to_pylist() == ["d2", "d4", "d1", "d9"]
    assert back.column("score").to_pylist() == [3.0, 2.0, 1.0, 5.5]


def test_qrels_reader(tmp_path):
    (tmp_path / "a.qrels").write_text("q1 0 d1 1\nq1 0 d2 2\nq1 0 d3 0\n")
    (tmp_path / "b.qrels").write_text("q2\t0\td1\t1\n")
    qrels = read_qrels(str(tmp_path / "*.qrels"))
    assert qrels == {"q1": {"d1": 1, "d2": 2, "d3": 0}, "q2": {"d1": 1}}


@pytest.fixture
def qrels():
    return {"q1": {"d1": 1, "d2": 2, "d3": 0}, "q2": {"d1": 1}}


def test_metrics_hand_computed(qrels, results_table):
    scores = evaluate(qrels, results_table,
                      ["map", "ndcg", "ndcg'", "recall@1", "P@1",
                       "recip_rank"])
    q1 = scores["q1"]
    assert q1["map"] == pytest.approx((1 + 2 / 3) / 2)
    dcg = 2 / math.log2(2) + 1 / math.log2(4)
    idcg = 2 / math.log2(2) + 1 / math.log2(3)
    assert q1["ndcg"] == pytest.approx(dcg / idcg)
    assert q1["ndcg_prime"] == pytest.approx(1.0)  # judged-only = ideal
    assert q1["recall_1"] == pytest.approx(0.5)
    assert q1["P_1"] == pytest.approx(1.0)
    assert q1["recip_rank"] == pytest.approx(1.0)
    # q2's only result d9 is unjudged -> all zeros
    assert all(v == 0.0 for v in scores["q2"].values())


def test_metrics_topic_alignment(qrels):
    # run topic q3 not in qrels is dropped; qrels q2 missing -> zeros
    run = {"q1": {"d1": 1.0}, "q3": {"d1": 9.0}}
    scores = evaluate(qrels, run, ["map"])
    assert set(scores) == {"q1", "q2"}
    assert scores["q2"]["map"] == 0.0


def test_trec_eval_tiebreak():
    # equal scores -> doc_id DESCENDING (trec_eval convention)
    qrels = {"q": {"dz": 1}}
    run = {"q": {"da": 1.0, "dz": 1.0}}
    scores = evaluate(qrels, run, ["recip_rank"])
    assert scores["q"]["recip_rank"] == 1.0  # dz ranked first


def test_scores_file(tmp_path, qrels, results_table):
    scores = evaluate(qrels, results_table, ["map"])
    write_scores_file(scores, tmp_path / "scores.txt")
    text = (tmp_path / "scores.txt").read_text()
    lines = text.splitlines()
    assert lines[-1].startswith("map")
    assert lines[-1].split("\t")[1] == "all"
    mean = mean_scores(scores)["map"]
    assert f"{mean:.4f}" in lines[-1]
