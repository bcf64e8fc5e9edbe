"""Distributed Lloyd refinement (functions/similarity.kmeans_refine,
ivf_assign_counts)."""

import numpy as np
import pytest
import pyarrow as pa
import ray.data

from patapsco_ray.functions import ivf_assign_counts, kmeans_refine
from patapsco_ray.functions.similarity import _normalize


def _emb_ds(X, ids=None):
    n, d = X.shape
    return ray.data.from_arrow(pa.table({
        "vec_id": ids if ids is not None else list(range(n)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(X.astype(np.float32).ravel()), d),
    }))


def _local_lloyd(X, C, iters):
    """Single-process reference of the spherical update."""
    Xn = _normalize(X.astype(np.float64))
    C = _normalize(C.astype(np.float64))
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for c in range(C.shape[0]):
            m = Xn[assign == c]
            if len(m):
                C[c] = m.sum(axis=0)
        C = _normalize(C)
    return C


def test_kmeans_refine_matches_local_reference(ray_session):
    rng = np.random.default_rng(5)
    X = rng.normal(size=(200, 6))
    C0 = X[:4]
    ds = _emb_ds(X).repartition(7)  # partial sums fold across blocks
    got = kmeans_refine(ds, C0, iters=3)
    # the dataset stores float32 embeddings; the reference must see the
    # same rounded inputs
    want = _local_lloyd(X.astype(np.float32).astype(np.float64), C0, 3)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_kmeans_refine_deterministic_across_runs(ray_session):
    rng = np.random.default_rng(6)
    X = rng.normal(size=(150, 5))
    ds = _emb_ds(X).repartition(5)
    a = kmeans_refine(ds, X[:3], iters=2)
    b = kmeans_refine(ds, X[:3], iters=2)
    np.testing.assert_array_equal(a, b)


def test_kmeans_refine_empty_centroid_keeps_position(ray_session):
    # two tight clusters + one centroid far from all data: it gets no
    # members and must keep its (normalized) initial position
    X = np.vstack([
        np.tile([1.0, 0.0, 0.0], (10, 1)) + 1e-3,
        np.tile([0.0, 1.0, 0.0], (10, 1)) + 1e-3,
    ])
    C0 = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, -1.0]])
    got = kmeans_refine(_emb_ds(X), C0, iters=2)
    np.testing.assert_allclose(got[2], [0.0, 0.0, -1.0], atol=1e-12)


def _local_lloyd_euclid(X, C, iters):
    """Single-process reference of the EUCLIDEAN (non-spherical) update."""
    X = X.astype(np.float64)
    C = C.astype(np.float64).copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for c in range(C.shape[0]):
            m = X[assign == c]
            if len(m):
                C[c] = m.mean(axis=0)
    return C


def test_kmeans_refine_euclidean_matches_local_reference(ray_session):
    # unnormalized data with very different norms per cluster — the
    # dot-product assignment bug would collapse everything onto the
    # large-norm centroid; nearest-Euclidean must match plain Lloyd
    rng = np.random.default_rng(11)
    X = np.vstack([
        rng.normal(loc=[10.0, 0.0, 0.0], scale=0.1, size=(40, 3)),
        rng.normal(loc=[0.2, 0.1, 0.0], scale=0.05, size=(40, 3)),
        rng.normal(loc=[0.0, -3.0, 1.0], scale=0.1, size=(40, 3)),
    ])
    C0 = X[[0, 40, 80]]
    ds = _emb_ds(X).repartition(6)
    got = kmeans_refine(ds, C0, iters=3, spherical=False)
    want = _local_lloyd_euclid(X.astype(np.float32), C0.astype(np.float32),
                               3)
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)
    # each centroid must sit near its own cluster mean, not collapse
    assert np.linalg.norm(got[0] - [10, 0, 0]) < 0.5
    assert np.linalg.norm(got[1] - [0.2, 0.1, 0]) < 0.5
    assert np.linalg.norm(got[2] - [0, -3, 1]) < 0.5


def test_ivf_assign_counts_partitions_everything(ray_session):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(120, 4))
    t = ivf_assign_counts(_emb_ds(X), ncentroids=4, refine_iters=1)
    rows = t.to_pylist()
    assert sum(r["n_members"] for r in rows) == 120
    assert all(0 <= r["centroid_id"] < 4 for r in rows)


# ---- k-means|| / random-hash seeding (beyond the oracle's min_id) ----

from patapsco_ray.functions import ivf_assign_counts as _iac
from patapsco_ray.functions import kmeans_parallel_init


def _clustered(rng, centers, per=40, scale=0.05):
    return np.vstack([rng.normal(loc=c, scale=scale, size=(per, len(c)))
                      for c in centers])


def test_kmeans_parallel_init_deterministic(ray_session):
    rng = np.random.default_rng(31)
    X = _clustered(rng, [[1, 0, 0], [0, 1, 0], [0, 0, 1]])
    ds = _emb_ds(X).repartition(5)
    a = kmeans_parallel_init(ds, 3, seed=4)
    b = kmeans_parallel_init(ds, 3, seed=4)
    np.testing.assert_array_equal(a, b)
    c = kmeans_parallel_init(ds, 3, seed=5)
    assert not np.array_equal(a, c)  # seed actually steers sampling


def test_kmeans_parallel_init_recovers_separated_clusters(ray_session):
    rng = np.random.default_rng(33)
    centers = [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
    X = _clustered(rng, centers, per=60)
    ds = _emb_ds(X).repartition(6)
    C = kmeans_parallel_init(ds, 4, seed=1)
    assert C.shape == (4, 4)
    # every true center has a seed within cosine distance 0.1 of it,
    # and all four seeds claim DIFFERENT true centers
    tc = _normalize(np.asarray(centers, dtype=np.float64))
    claims = np.argmax(C @ tc.T, axis=1)
    assert sorted(claims.tolist()) == [0, 1, 2, 3]
    assert (np.max(C @ tc.T, axis=1) > 0.9).all()


def test_kmeans_parallel_init_euclidean(ray_session):
    rng = np.random.default_rng(37)
    X = np.vstack([
        rng.normal(loc=[10.0, 0.0], scale=0.1, size=(50, 2)),
        rng.normal(loc=[0.2, 0.1], scale=0.03, size=(50, 2)),
    ])
    ds = _emb_ds(X).repartition(4)
    C = kmeans_parallel_init(ds, 2, seed=2, spherical=False)
    d = np.linalg.norm(C[:, None, :] - np.array([[10, 0], [0.2, 0.1]]),
                       axis=2)
    assert sorted(np.argmin(d, axis=1).tolist()) == [0, 1]
    assert d.min(axis=1).max() < 1.0


def test_ivf_assign_counts_alternate_inits(ray_session):
    rng = np.random.default_rng(41)
    X = rng.normal(size=(150, 4))
    ds = _emb_ds(X)
    for init in ("random_hash", "kmeans_par"):
        t = _iac(ds, ncentroids=4, refine_iters=1, init=init, seed=3)
        rows = t.to_pylist()
        assert sum(r["n_members"] for r in rows) == 150, init
    with pytest.raises(ValueError, match="unknown init"):
        _iac(ds, ncentroids=4, init="bogus")
