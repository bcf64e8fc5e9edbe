"""select_by_token_budget + importance_sample unit tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from patapsco_ray.functions import (
    importance_sample,
    importance_sample_sql,
    select_by_token_budget,
)
from patapsco_ray.functions.hashing import splitmix64
from patapsco_ray.functions.sampling import _salt


def _corpus(n=200, seed=7):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(50)]
    texts, prios = [], []
    for i in range(n):
        k = int(rng.integers(0, 12))  # some zero-token docs
        texts.append(" ".join(rng.choice(words, size=k)) if k else "")
        prios.append(int(rng.integers(0, 8)))  # ties everywhere
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "prio": pa.array(prios, pa.int64()),
    })


def _expected(tbl: pa.Table, budget: int):
    ids = np.asarray(tbl.column("doc_id"))
    prio = np.asarray(tbl.column("prio"))
    nt = np.array([len([w for w in t.split(" ") if w])
                   for t in tbl.column("text").to_pylist()])
    order = np.lexsort((ids, -prio))  # prio DESC, id ASC
    cum = np.cumsum(nt[order])
    sel = order[cum <= budget]
    return {int(ids[i]): int(nt[i]) for i in sel}


@pytest.mark.parametrize("budget", [0, 1, 37, 250, 10**9])
def test_budget_matches_bruteforce(ray_session, budget):
    tbl = _corpus()
    ds = ray.data.from_arrow(tbl).repartition(5)
    out = select_by_token_budget(
        ds, budget=budget, priority_column="prio")
    got = {r["doc_id"]: r["n_tokens"] for r in out.take_all()}
    assert got == _expected(tbl, budget)


def test_budget_exact_tier_boundary(ray_session):
    # budget landing exactly on a tier's cumulative total
    tbl = _corpus()
    prio = np.asarray(tbl.column("prio"))
    nt = np.array([len([w for w in t.split(" ") if w])
                   for t in tbl.column("text").to_pylist()])
    top_total = int(nt[prio == 7].sum())
    ds = ray.data.from_arrow(tbl).repartition(3)
    got = {r["doc_id"]: r["n_tokens"] for r in select_by_token_budget(
        ds, budget=top_total, priority_column="prio").take_all()}
    assert got == _expected(tbl, top_total)
    # one more token reaches into the next tier's zero/low-token docs
    got2 = {r["doc_id"]: r["n_tokens"] for r in select_by_token_budget(
        ds, budget=top_total + 1, priority_column="prio").take_all()}
    assert got2 == _expected(tbl, top_total + 1)


def test_budget_bucketed_boundary_path(ray_session):
    # force the id-range bucket refinement and check identity with the
    # small-tier driver fold
    tbl = _corpus(n=300)
    ds = ray.data.from_arrow(tbl).repartition(7)
    for budget in (5, 83, 400):
        small = select_by_token_budget(
            ds, budget=budget, priority_column="prio")
        forced = select_by_token_budget(
            ds, budget=budget, priority_column="prio",
            max_boundary_rows=1, id_bucket_count=4)
        a = {r["doc_id"]: r["n_tokens"] for r in small.take_all()}
        b = {r["doc_id"]: r["n_tokens"] for r in forced.take_all()}
        assert a == b == _expected(tbl, budget)


def test_budget_rejects_bad_columns(ray_session):
    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a", "b"]),
        "prio": pa.array([0.5, 1.5], pa.float64()),
    })
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(Exception, match="integer"):
        select_by_token_budget(ds, budget=10,
                               priority_column="prio").take_all()


def test_importance_sample_bruteforce_and_nesting(ray_session):
    n = 500
    w = [(i % 100) / 100.0 for i in range(n)]
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "w": pa.array(w, pa.float64()),
    })
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = importance_sample(ds, weight_column="w", seed=11)
    got = sorted(r["doc_id"] for r in out.take_all())
    salt = _salt(11)
    keys = np.arange(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        u = splitmix64(keys ^ np.uint64(salt)).astype(np.float64) / 2**64
    expect = sorted(int(i) for i in np.flatnonzero(u < np.asarray(w)))
    assert got == expect
    # nested subsets: doubling every weight only ADDS rows
    tbl2 = tbl.set_column(1, "w", pa.array(
        [min(x * 2, 1.0) for x in w], pa.float64()))
    got2 = set(r["doc_id"] for r in importance_sample(
        ray.data.from_arrow(tbl2), weight_column="w", seed=11).take_all())
    assert set(got) <= got2
    # null weights drop the row
    tbl3 = tbl.set_column(1, "w", pa.array([None] * n, pa.float64()))
    assert importance_sample(ray.data.from_arrow(tbl3),
                             weight_column="w", seed=11).count() == 0


def test_importance_sample_sql_parity(ray_session):
    import duckdb

    n = 400
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "n_chars": pa.array([(i * 37) % 997 for i in range(n)], pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", tbl)
    pred = importance_sample_sql("doc_id", "(n_chars % 1000) / 1000.0",
                                 seed=5)
    sql_ids = sorted(r[0] for r in con.execute(
        f"SELECT doc_id FROM t WHERE {pred}").fetchall())
    ds = ray.data.from_arrow(tbl).map_batches(
        lambda b: b.append_column(
            "w", pa.array((np.asarray(b.column("n_chars")) % 1000)
                          / 1000.0, pa.float64())),
        batch_format="pyarrow")
    ray_ids = sorted(r["doc_id"] for r in importance_sample(
        ds, weight_column="w", seed=5).take_all())
    assert ray_ids == sql_ids and len(ray_ids) > 0
