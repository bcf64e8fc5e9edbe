"""Connected components + cluster dedup (functions/cluster.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from patapsco_ray.functions.cluster import (
    _driver_components,
    connected_components,
    dedup_keep,
    near_dedup,
)


def _driver_union_find(pairs, typ=pa.string()):
    """Reference wrapper over the vectorized driver path."""
    t = pa.table({"u": pa.array([a for a, _ in pairs], typ),
                  "v": pa.array([b for _, b in pairs], typ)})
    out = _driver_components(t)
    return dict(zip(out.column("id").to_pylist(),
                    out.column("root").to_pylist()))
from patapsco_ray.functions.dedup import exact_duplicate_pairs


def _pairs_ds(pairs, typ=pa.string()):
    return ray.data.from_arrow(pa.table({
        "id_a": pa.array([a for a, _ in pairs], typ),
        "id_b": pa.array([b for _, b in pairs], typ),
    }))


def _comp_dict(ds):
    t = ds.take_all()
    return {r["id"]: r["root"] for r in t}


CHAIN = [("b", "c"), ("a", "b"), ("d", "c"), ("x", "y"), ("z", "y")]
CHAIN_EXPECT = {"a": "a", "b": "a", "c": "a", "d": "a",
                "x": "x", "y": "x", "z": "x"}


def test_union_find_chain():
    assert _driver_union_find(CHAIN) == CHAIN_EXPECT


def test_components_driver_path(ray_session):
    got = _comp_dict(connected_components(_pairs_ds(CHAIN)))
    assert got == CHAIN_EXPECT


def test_components_distributed_path(ray_session):
    got = _comp_dict(
        connected_components(_pairs_ds(CHAIN), driver_threshold=0))
    assert got == CHAIN_EXPECT


def test_components_distributed_random_graph(ray_session):
    rng = np.random.default_rng(5)
    ids = [f"n{i:03d}" for i in range(120)]
    pairs = []
    # several chains + cliques + self-contained stars
    for lo in range(0, 120, 15):
        member = ids[lo:lo + 15]
        perm = rng.permutation(member)
        pairs += list(zip(perm[:-1], perm[1:]))
    exact = _driver_union_find(pairs)
    got = _comp_dict(
        connected_components(_pairs_ds(pairs), driver_threshold=0))
    assert got == exact


def test_components_int_ids(ray_session):
    pairs = [(3, 7), (7, 9), (20, 11)]
    got = _comp_dict(connected_components(
        _pairs_ds(pairs, pa.int64()), driver_threshold=0))
    assert got == {3: 3, 7: 3, 9: 3, 11: 11, 20: 11}
    got2 = _comp_dict(connected_components(_pairs_ds(pairs, pa.int64())))
    assert got2 == {3: 3, 7: 3, 9: 3, 11: 11, 20: 11}


def test_components_empty(ray_session):
    ds = connected_components(_pairs_ds([]))
    assert ds.count() == 0


def _docs_ds():
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["a", "b", "c", "d", "x", "y", "z", "solo"]),
        "text": pa.array(["t a", "t b", "t c", "t d",
                          "t x", "t y", "t z", "t solo"]),
    }))


def test_dedup_keep_broadcast(ray_session):
    comps = connected_components(_pairs_ds(CHAIN))
    kept = dedup_keep(_docs_ds(), comps)
    ids = sorted(r["doc_id"] for r in kept.take_all())
    assert ids == ["a", "solo", "x"]


def test_dedup_keep_join_path(ray_session):
    comps = connected_components(_pairs_ds(CHAIN))
    kept = dedup_keep(_docs_ds(), comps, broadcast_threshold=0)
    ids = sorted(r["doc_id"] for r in kept.take_all())
    assert ids == ["a", "solo", "x"]
    # full doc rows survive
    row = next(r for r in kept.take_all() if r["doc_id"] == "solo")
    assert row["text"] == "t solo"


def test_dedup_keep_no_dups(ray_session):
    comps = connected_components(_pairs_ds([]))
    kept = dedup_keep(_docs_ds(), comps)
    assert kept.count() == 8


def test_exact_duplicate_pairs(ray_session):
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["d1", "d2", "d3", "d4", "d5"]),
        "text": pa.array(["same", "same", "other", "same", "unique"]),
    }))
    pairs = sorted((r["id_a"], r["id_b"])
                   for r in exact_duplicate_pairs(docs).take_all())
    assert pairs == [("d1", "d2"), ("d1", "d4")]


def test_near_dedup_exact_end_to_end(ray_session):
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["d1", "d2", "d3", "d4", "d5"]),
        "text": pa.array(["same", "same", "other", "same", "unique"]),
    }))
    kept = sorted(r["doc_id"]
                  for r in near_dedup(docs, method="exact").take_all())
    assert kept == ["d1", "d3", "d5"]


def test_near_dedup_jaccard_end_to_end(ray_session):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["a1", "a2", "b1", "c1"]),
        "text": pa.array([base, base + " iota",
                          "totally different words here now",
                          "yet another unrelated document text"]),
    }))
    kept = sorted(r["doc_id"] for r in near_dedup(
        docs, method="jaccard", threshold=0.5).take_all())
    assert kept == ["a1", "b1", "c1"]


def test_near_dedup_unknown_method(ray_session):
    with pytest.raises(ValueError):
        near_dedup(_docs_ds(), method="nope")


def test_vectorized_star_rounds_match_driver(ray_session, monkeypatch):
    """The join-vectorized star path (engaged above _VEC_STAR_MIN_EDGES)
    must produce the same components as the driver union-find."""
    import numpy as np

    from patapsco_ray.functions import cluster as cmod

    rng = np.random.default_rng(13)
    # ~3000 edges over chains/cliques: big enough that every join
    # partition holds rows, small enough for a quick test
    ids = [f"n{i:05d}" for i in range(3000)]
    pairs = []
    for lo in range(0, 3000, 30):
        member = ids[lo:lo + 30]
        perm = rng.permutation(member)
        pairs += list(zip(perm[:-1], perm[1:]))
    exact = _driver_union_find(pairs)
    monkeypatch.setattr(cmod, "_VEC_STAR_MIN_EDGES", 1)
    got = _comp_dict(
        connected_components(_pairs_ds(pairs), driver_threshold=0))
    assert got == exact
