"""Similarity search over an embedding column (list<float>).

- :func:`cosine_topk` — brute-force cosine top-k: the (small) query
  matrix is broadcast once via ``ray.put`` and every batch does one
  float64 matmul against it; per-batch partial top-k then an exact
  per-query merge (``groupby(query_id)``). This is the exact baseline.
- :func:`cosine_neardup_pairs` — exact all-pairs near-duplicates via
  blocked matmul over materialized Arrow blocks (raw Ray tasks: an
  all-pairs product is the one shape the streaming Dataset API cannot
  express; O(B^2) tasks over B blocks).
- :func:`lsh_cosine_topk` — random-hyperplane LSH bucketing with
  multi-probe, exact rescoring of candidates: the approximate scale
  path (recall < 1 by construction).

Score convention shared with the DuckDB oracles: cosine scaled to
int64 as floor(cos*1e6 + 0.5); ordering by (score_1e6 desc, id asc) so
ranks are reproducible across float backends.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _matrix(tbl_or_col, vector_column: str | None = None) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (fixed dim)."""
    col = (tbl_or_col.column(vector_column)
           if vector_column is not None else tbl_or_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.flatten().to_numpy(zero_copy_only=False),
                      dtype=np.float64)
    n = len(col)
    if n == 0:
        return flat.reshape(0, 0)
    d = flat.size // n
    if d * n != flat.size:
        raise ValueError("embedding column has ragged dimensions")
    return flat.reshape(n, d)


def _normalize(x: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return x / norms


def _scaled(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1e6 + 0.5).astype(np.int64)


def cosine_topk(
    ds: ray.data.Dataset,
    query_vectors: np.ndarray,
    *,
    query_ids: list[str] | None = None,
    k: int = 10,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
) -> ray.data.Dataset:
    """Exact cosine top-k of each query vector against the dataset.

    Returns (query_id, id, rank, score_1e6); rank 0-based by
    (score_1e6 desc, id asc). Pre-filter ``ds`` to restrict candidates.
    """
    Q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    qids = query_ids or [f"q{i}" for i in range(len(Q))]
    qref = ray.put((Q, list(qids)))

    def partial(tbl: pa.Table) -> pa.Table:
        Qn, qid_list = ray.get(qref)
        X = _normalize(_matrix(tbl, vector_column))
        n = X.shape[0]
        empty = pa.table({
            "query_id": pa.array([], pa.string()),
            id_column: pa.array([], tbl.column(id_column).type),
            "score_1e6": pa.array([], pa.int64()),
        })
        if n == 0:
            return empty
        S = X @ Qn.T  # (n, q)
        kk = min(k, n)
        out_q, out_idx, out_s = [], [], []
        for qi in range(S.shape[1]):
            col = S[:, qi]
            part = np.argpartition(-col, kk - 1)[:kk] if n > kk else \
                np.arange(n)
            out_q.extend([qid_list[qi]] * len(part))
            out_idx.append(part)
            out_s.append(col[part])
        idx = np.concatenate(out_idx)
        return pa.table({
            "query_id": pa.array(out_q, pa.string()),
            id_column: tbl.column(id_column).take(pa.array(idx)),
            "score_1e6": pa.array(_scaled(np.concatenate(out_s))),
        })

    cands = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    return _merge_query_topk(cands, id_column, k, _id_type(ds, id_column))


def _id_type(ds: ray.data.Dataset, id_column: str) -> pa.DataType:
    """Id column type from the INPUT dataset (metadata-only for
    parquet-backed datasets — avoids executing the candidate plan)."""
    schema = ds.schema()
    base = getattr(schema, "base_schema", schema)
    return base.field(id_column).type


def _merge_query_topk(cands: ray.data.Dataset, id_column: str,
                      k: int, id_type: pa.DataType) -> ray.data.Dataset:
    """Per-query exact merge of partial top-k candidate rows:
    (query_id, id, score_1e6) -> top-k by (score_1e6 desc, id asc)."""

    def final_topk(grp: pa.Table) -> pa.Table:
        s = grp.column("score_1e6").to_numpy()
        ids = grp.column(id_column)
        idv = ids.to_numpy(zero_copy_only=False)
        order = np.lexsort((idv, -s))[:k]
        return pa.table({
            "query_id": grp.column("query_id").slice(0, 1).take(
                pa.array(np.zeros(len(order), dtype=np.int64))),
            id_column: ids.take(pa.array(order)),
            "rank": pa.array(np.arange(len(order), dtype=np.int64)),
            "score_1e6": pa.array(s[order]),
        })

    out_schema = pa.schema([
        ("query_id", pa.string()),
        (id_column, id_type),
        ("rank", pa.int64()),
        ("score_1e6", pa.int64()),
    ])

    def pin(tbl: pa.Table) -> pa.Table:
        # empty shuffle partitions emit schema-less blocks otherwise
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        return tbl.cast(out_schema)

    return cands.groupby("query_id").map_groups(
        final_topk, batch_format="pyarrow").map_batches(
        pin, batch_format="pyarrow", zero_copy_batch=True)


def cosine_neardup_pairs(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.4,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    exact_max_rows: int | None = 2_000_000,
    planes: int = 12,
    num_tables: int = 4,
    seed: int = 5,
    max_bucket_rows: int = 20_000,
) -> ray.data.Dataset:
    """Embedding near-duplicate pairs: (id_a, id_b, score_1e6) with
    id_a < id_b and cosine >= threshold.

    Scale-adaptive BY DEFAULT: up to ``exact_max_rows`` (2M) rows the
    EXACT all-pairs blocked matmul runs (the oracle-checked baseline;
    O(B^2) block tasks — already ~1.3e13 dot products at the bound);
    above it a streaming LSH-bucketed path runs instead
    (`random-hyperplane buckets x num_tables` -> within-bucket exact
    verify -> pair dedup) whose recall < 1 by construction — a loud
    warning is logged when it is selected, since results are
    approximate. Pass ``exact_max_rows=None`` to force the exact path
    at ANY size (the explicit oracle/audit flag — O(B^2) full
    materialization, never the default at embedding scale), or
    ``exact_max_rows=0`` for the pure streaming LSH path with no
    materialization and no count probe. The adaptive probe counts the
    column-pruned projection after materializing it ONCE (no double
    execution of the upstream plan).
    """
    if exact_max_rows is not None and exact_max_rows <= 0:
        # pure streaming path: no materialization, no count probe
        import logging
        logging.getLogger(__name__).warning(
            "cosine_neardup_pairs: using APPROXIMATE LSH path "
            "(exact_max_rows=%s); recall < 1 by construction",
            exact_max_rows)
        return _neardup_lsh(
            ds, threshold=threshold, id_column=id_column,
            vector_column=vector_column, planes=planes,
            num_tables=num_tables, seed=seed,
            max_bucket_rows=max_bucket_rows)
    proj = ds.select_columns([id_column, vector_column]).materialize()
    if exact_max_rows is not None and proj.count() > exact_max_rows:
        import logging
        logging.getLogger(__name__).warning(
            "cosine_neardup_pairs: %d rows > exact_max_rows=%d — "
            "switching to the APPROXIMATE LSH path (recall < 1)",
            proj.count(), exact_max_rows)
        return _neardup_lsh(
            proj, threshold=threshold, id_column=id_column,
            vector_column=vector_column, planes=planes,
            num_tables=num_tables, seed=seed,
            max_bucket_rows=max_bucket_rows)
    refs = proj.to_arrow_refs()

    @ray.remote
    def block_pair(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        Xa = _normalize(_matrix(ta, vector_column))
        Xb = _normalize(_matrix(tb, vector_column))
        ida = ta.column(id_column).to_numpy(zero_copy_only=False)
        idb = tb.column(id_column).to_numpy(zero_copy_only=False)
        if Xa.shape[0] == 0 or Xb.shape[0] == 0:
            S = np.zeros((0, 0))
        else:
            S = Xa @ Xb.T
        ii, jj = np.nonzero(S >= threshold)
        if same:
            keep = ii < jj
        else:
            # every cross-block hit is a distinct unordered pair (each
            # block pair is visited once) — keep them ALL; filtering on
            # ida < idb silently drops pairs whenever materialize()
            # yields blocks whose id ranges are not globally sorted
            keep = ida[ii] != idb[jj]
        ii, jj = ii[keep], jj[keep]
        a, b = ida[ii], idb[jj]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pa.table({
            "id_a": pa.array(a2),
            "id_b": pa.array(b2),
            "score_1e6": pa.array(_scaled(S[ii, jj])),
        })

    tasks = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            tasks.append(block_pair.remote(refs[i], refs[j], i == j))
    return ray.data.from_arrow_refs(tasks)


class _NeardupBucketEmitter:
    """map_batches stage: replicate each row into its ``num_tables``
    LSH buckets (hyperplanes generated once per actor, deterministic
    in (seed, dim))."""

    def __init__(self, planes: int, num_tables: int, seed: int,
                 id_column: str, vector_column: str):
        self.planes = planes
        self.num_tables = num_tables
        self.seed = seed
        self.id_column = id_column
        self.vector_column = vector_column
        self._R: np.ndarray | None = None

    def __call__(self, tbl: pa.Table) -> pa.Table:
        out_schema = pa.schema([
            ("bucket", pa.int64()),
            (self.id_column, tbl.schema.field(self.id_column).type),
            (self.vector_column, tbl.schema.field(self.vector_column).type),
        ])
        X = _normalize(_matrix(tbl, self.vector_column))
        if X.shape[0] == 0:
            return out_schema.empty_table()
        if self._R is None:
            rng = np.random.default_rng(self.seed)
            self._R = rng.standard_normal(
                (self.num_tables, X.shape[1], self.planes))
        parts = []
        shifts = np.arange(self.planes, dtype=np.uint64)
        sub = tbl.select([self.id_column, self.vector_column])
        for t in range(self.num_tables):
            bits = (X @ self._R[t]) > 0
            bucket = ((bits.astype(np.uint64) << shifts).sum(axis=1)
                      | np.uint64(t << self.planes)).astype(np.int64)
            parts.append(sub.add_column(
                0, "bucket", pa.array(bucket, pa.int64())))
        return pa.concat_tables(parts).cast(out_schema)


def _neardup_lsh(
    ds: ray.data.Dataset,
    *,
    threshold: float,
    id_column: str,
    vector_column: str,
    planes: int,
    num_tables: int,
    seed: int,
    max_bucket_rows: int,
) -> ray.data.Dataset:
    """Streaming LSH near-dup path: bucket -> within-bucket exact
    verify -> (id_a, id_b) dedup across tables. The only shuffles move
    (bucket, id, embedding) rows and the (small) verified pairs; no
    driver-side materialization. Buckets larger than
    ``max_bucket_rows`` are truncated by ascending id (a safety valve
    against degenerate buckets; with default planes the expected
    bucket is ndocs / 2^planes)."""

    bucketed = ds.map_batches(
        _NeardupBucketEmitter,
        fn_constructor_kwargs={
            "planes": planes, "num_tables": num_tables, "seed": seed,
            "id_column": id_column, "vector_column": vector_column,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )

    def pairs_in_bucket(grp: pa.Table) -> pa.Table:
        id_type = grp.schema.field(id_column).type
        out_schema = pa.schema([
            ("id_a", id_type), ("id_b", id_type),
            ("score_1e6", pa.int64()),
        ])
        if grp.num_rows < 2:
            return out_schema.empty_table()
        if grp.num_rows > max_bucket_rows:
            order = pa.compute.sort_indices(grp.column(id_column))
            grp = grp.take(order.slice(0, max_bucket_rows))
        X = _normalize(_matrix(grp, vector_column))
        ids = grp.column(id_column).to_numpy(zero_copy_only=False)
        S = X @ X.T
        ii, jj = np.nonzero(S >= threshold)
        keep = ids[ii] < ids[jj]
        ii, jj = ii[keep], jj[keep]
        return pa.table({
            "id_a": pa.array(ids[ii], id_type),
            "id_b": pa.array(ids[jj], id_type),
            "score_1e6": pa.array(_scaled(S[ii, jj])),
        }, schema=out_schema)

    pairs = bucketed.groupby("bucket").map_groups(
        lambda g: pairs_in_bucket(g.drop_columns(["bucket"])),
        batch_format="pyarrow",
    )

    def first_row(grp: pa.Table) -> pa.Table:
        return grp.slice(0, 1)

    # the same pair can surface from several tables/buckets: keep one
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        first_row, batch_format="pyarrow")


def lsh_cosine_topk(
    ds: ray.data.Dataset,
    query_vectors: np.ndarray,
    *,
    query_ids: list[str] | None = None,
    k: int = 10,
    planes: int = 10,
    probes: int = 1,
    seed: int = 5,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
) -> ray.data.Dataset:
    """Approximate cosine top-k: random-hyperplane buckets + exact
    rescoring of bucket candidates. ``probes`` is the multi-probe
    Hamming radius: every bucket within ``probes`` bit flips of a
    query's bucket is scanned. ``probes >= planes`` probes EVERY
    bucket, making the result exactly :func:`cosine_topk` — the
    degenerate-parameter configuration the driver's SQL oracle
    value-checks. Same output schema as :func:`cosine_topk`; recall
    < 1 by construction for smaller radii."""
    from itertools import combinations

    Q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    d = Q.shape[1]
    rng = np.random.default_rng(seed)
    R = rng.standard_normal((d, planes))

    def bucket_of(X: np.ndarray) -> np.ndarray:
        bits = (X @ R) > 0
        return (bits.astype(np.uint64) <<
                np.arange(planes, dtype=np.uint64)).sum(axis=1)

    qb = bucket_of(Q)
    probe_set: set[int] = set()
    if probes >= planes:
        probe_set.update(range(1 << planes))
    else:
        for b in qb:
            b = int(b)
            probe_set.add(b)
            for r in range(1, max(probes, 0) + 1):
                for bits in combinations(range(planes), r):
                    m = 0
                    for bit in bits:
                        m |= 1 << bit
                    probe_set.add(b ^ m)
    # broadcast a SORTED bucket array so the probe filter is one
    # vectorized np.isin per batch, not a per-row Python set probe
    probe_ref = ray.put(np.array(sorted(probe_set), dtype=np.int64))

    def flt(tbl: pa.Table) -> pa.Table:
        ps = ray.get(probe_ref)
        X = _matrix(tbl, vector_column)
        if X.shape[0] == 0:
            return tbl
        bk = bucket_of(_normalize(X)).astype(np.int64)
        mask = np.isin(bk, ps, assume_unique=False)
        return tbl.filter(pa.array(mask))

    candidates = ds.map_batches(flt, batch_format="pyarrow",
                                zero_copy_batch=True)
    return cosine_topk(candidates, query_vectors, query_ids=query_ids, k=k,
                       id_column=id_column, vector_column=vector_column)


def train_ivf_centroids(
    ds: ray.data.Dataset,
    *,
    ncentroids: int = 64,
    sample_rows: int = 20_000,
    iters: int = 8,
    seed: int = 11,
    vector_column: str = "embedding",
) -> np.ndarray:
    """Seeded spherical k-means over a bounded sample -> unit centroids.

    IVF's standard recipe at scale: the coarse quantizer is trained on
    a driver-sized sample (20k rows regardless of corpus size), then
    broadcast; only assignment runs over the full data. Deterministic
    in (seed, sample): ``limit()`` takes the first blocks of the
    dataset's stable plan order.
    """
    sample = ds.select_columns([vector_column]).limit(sample_rows)
    parts = [ray.get(r) for r in sample.to_arrow_refs()]
    if not parts:
        raise ValueError("cannot train IVF centroids on an empty dataset")
    X = _normalize(_matrix(pa.concat_tables(parts), vector_column))
    n = X.shape[0]
    if n == 0:
        raise ValueError("cannot train IVF centroids on an empty dataset")
    ncentroids = min(ncentroids, n)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(n, size=ncentroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(ncentroids):
            members = X[assign == c]
            if len(members):
                C[c] = members.sum(axis=0)
        C = _normalize(C)
    return C


def ivf_cosine_topk(
    ds: ray.data.Dataset,
    query_vectors: np.ndarray,
    *,
    query_ids: list[str] | None = None,
    k: int = 10,
    ncentroids: int = 64,
    nprobe: int = 8,
    sample_rows: int = 20_000,
    seed: int = 11,
    centroids: np.ndarray | None = None,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
) -> ray.data.Dataset:
    """Approximate cosine top-k via an IVF coarse quantizer.

    Each query probes its ``nprobe`` nearest centroids; every batch
    assigns its rows to centroids with one matmul and scores a row for
    a query only when the row's cell is probed by that query (a
    (ncentroids, nqueries) membership table gathers to an (n, q)
    mask — no Python loop over rows). Same output schema as
    :func:`cosine_topk`; recall < 1 by construction, rising with
    ``nprobe`` (== ncentroids recovers the exact result). Pass
    pretrained ``centroids`` to skip sampling (e.g. reuse across query
    batches or shards at scale).
    """
    Q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    qids = list(query_ids or [f"q{i}" for i in range(len(Q))])
    C = (np.asarray(centroids, dtype=np.float64) if centroids is not None
         else train_ivf_centroids(
             ds, ncentroids=ncentroids, sample_rows=sample_rows,
             vector_column=vector_column, seed=seed))
    nc = C.shape[0]
    nprobe = min(nprobe, nc)
    # (nc, q) membership: True where query q probes centroid c
    probed = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (q, nprobe)
    member = np.zeros((nc, len(qids)), dtype=bool)
    member[probed.T, np.arange(len(qids))[None, :].repeat(nprobe, 0)] = True
    bref = ray.put((C, member, Q, qids))

    def partial(tbl: pa.Table) -> pa.Table:
        Cn, M, Qn, qid_list = ray.get(bref)
        X = _normalize(_matrix(tbl, vector_column))
        n = X.shape[0]
        empty = pa.table({
            "query_id": pa.array([], pa.string()),
            id_column: pa.array([], tbl.column(id_column).type),
            "score_1e6": pa.array([], pa.int64()),
        })
        if n == 0:
            return empty
        assign = np.argmax(X @ Cn.T, axis=1)            # (n,)
        mask = M[assign]                                # (n, q)
        S = np.where(mask, X @ Qn.T, -np.inf)
        kk = min(k, n)
        out_q, out_idx, out_s = [], [], []
        for qi in range(S.shape[1]):
            col = S[:, qi]
            part = (np.argpartition(-col, kk - 1)[:kk] if n > kk
                    else np.arange(n))
            keep = np.isfinite(col[part])
            part = part[keep]
            out_q.extend([qid_list[qi]] * len(part))
            out_idx.append(part)
            out_s.append(col[part])
        idx = (np.concatenate(out_idx) if out_idx
               else np.empty(0, dtype=np.int64))
        if not len(idx):
            return empty
        return pa.table({
            "query_id": pa.array(out_q, pa.string()),
            id_column: tbl.column(id_column).take(pa.array(idx)),
            "score_1e6": pa.array(_scaled(np.concatenate(out_s))),
        })

    cands = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    return _merge_query_topk(cands, id_column, k, _id_type(ds, id_column))


def kmeans_refine(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    *,
    iters: int = 1,
    vector_column: str = "embedding",
    spherical: bool = True,
) -> np.ndarray:
    """Distributed Lloyd refinement of a centroid matrix.

    Each iteration broadcasts the current centroids once (``ray.put``)
    and runs ONE shuffle-free ``map_batches`` pass: every batch assigns
    its rows with a single matmul and emits per-centroid PARTIAL
    (count, sum-vector) rows — at most ``k`` rows per batch, so the
    driver fold is bounded by ``k x num_blocks`` regardless of corpus
    size (the partial-agg-before-reduce posture; the corpus itself is
    never collected). ``spherical=True`` (cosine / IVF training) sums
    L2-normalized rows and renormalizes the folded sums; empty
    centroids keep their previous position. Complements
    :func:`train_ivf_centroids` (driver-sample init) with full-corpus
    refinement passes.
    """
    C = np.asarray(centroids, dtype=np.float64)
    if C.ndim != 2:
        raise ValueError("centroids must be a (k, d) matrix")
    if spherical:
        C = _normalize(C)
    k, d = C.shape

    part_schema = pa.schema([
        ("cid", pa.int64()), ("n", pa.int64()),
        ("s", pa.list_(pa.float64(), d))])

    for _ in range(iters):
        ref = ray.put(C)

        def partial(tbl: pa.Table) -> pa.Table:
            X = _matrix(tbl, vector_column)
            if X.shape[0] == 0:
                return part_schema.empty_table()
            Xn = _normalize(X) if spherical else X
            Cc = ray.get(ref)
            if spherical:
                # rows and centroids are unit-norm: max dot product ==
                # min angle == nearest centroid
                assign = np.argmax(Xn @ Cc.T, axis=1)
            else:
                # nearest EUCLIDEAN centroid: argmin ||x-c||^2 ==
                # argmax (x.c - 0.5*||c||^2); plain argmax(x.c) would
                # bias assignment toward large-norm centroids and
                # minimize no objective (not Lloyd's algorithm)
                assign = np.argmax(
                    Xn @ Cc.T - 0.5 * (Cc * Cc).sum(axis=1), axis=1)
            counts = np.bincount(assign, minlength=k)
            sums = np.empty((k, d), dtype=np.float64)
            for j in range(d):
                sums[:, j] = np.bincount(assign, weights=Xn[:, j],
                                         minlength=k)
            nz = np.flatnonzero(counts)
            return pa.table({
                "cid": pa.array(nz.astype(np.int64)),
                "n": pa.array(counts[nz].astype(np.int64)),
                "s": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums[nz].ravel()), d),
            })

        rows = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        # deterministic fold order regardless of block arrival
        for r in sorted(rows, key=lambda r: r["cid"]):
            sums[r["cid"]] += np.asarray(r["s"], dtype=np.float64)
            counts[r["cid"]] += r["n"]
        nz = counts > 0
        if spherical:
            C = np.where(nz[:, None], sums, C)
            C = _normalize(C)
        else:
            C = np.where(nz[:, None], sums / np.maximum(counts, 1)[:, None],
                         C)
    return C


def _id_hash_u64(col, seed: int) -> np.ndarray:
    """Deterministic uint64 hash of an arbitrary-typed id column
    (version-stable string hash mixed with the seed)."""
    import pyarrow.compute as pc

    from .hashing import splitmix64, stable_hash_strings

    key = pc.cast(col, pa.string())
    if isinstance(key, pa.ChunkedArray):
        key = key.combine_chunks()
    h = stable_hash_strings(key)
    return splitmix64(h ^ splitmix64(
        np.full(len(h), np.uint64(seed), dtype=np.uint64)))


def _weighted_kmeans_local(P: np.ndarray, w: np.ndarray, k: int, *,
                           seed: int, iters: int,
                           spherical: bool) -> np.ndarray:
    """Weighted k-means++ init + weighted Lloyd over a SMALL candidate
    set (the final recluster step of k-means‖, Bahmani et al. VLDB'12
    §3.3) — driver-side, bounded by rounds x oversample rows."""
    rng = np.random.default_rng(seed)
    n = len(P)
    w = w.astype(np.float64)
    first = int(rng.choice(n, p=w / w.sum()))
    chosen = [first]
    if spherical:
        d2 = np.maximum(2.0 - 2.0 * (P @ P[first]), 0.0)
    else:
        d2 = ((P - P[first]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        probs = w * d2
        s = probs.sum()
        probs = (w / w.sum()) if s <= 0 else probs / s
        nxt = int(rng.choice(n, p=probs))
        chosen.append(nxt)
        if spherical:
            nd2 = np.maximum(2.0 - 2.0 * (P @ P[nxt]), 0.0)
        else:
            nd2 = ((P - P[nxt]) ** 2).sum(axis=1)
        d2 = np.minimum(d2, nd2)
    C = P[chosen].copy()
    for _ in range(iters):
        if spherical:
            assign = np.argmax(P @ C.T, axis=1)
        else:
            assign = np.argmax(P @ C.T - 0.5 * (C * C).sum(axis=1), axis=1)
        for c in range(k):
            m = assign == c
            if w[m].sum() > 0:
                C[c] = (w[m, None] * P[m]).sum(axis=0) / (
                    1.0 if spherical else w[m].sum())
        if spherical:
            C = _normalize(C)
    return C


def kmeans_parallel_init(
    ds: ray.data.Dataset,
    k: int,
    *,
    rounds: int = 3,
    oversample: int | None = None,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    seed: int = 0,
    spherical: bool = True,
    local_iters: int = 8,
) -> np.ndarray:
    """k-means‖ seeding (Bahmani et al., "Scalable k-means++",
    VLDB'12): a handful of corpus passes each sample ~``oversample``
    points with probability proportional to their squared distance to
    the current centers, then the O(rounds·oversample) candidates are
    weighted by cluster population and reclustered to ``k`` locally.

    Fully deterministic in ``seed``: the Bernoulli draws use
    ``splitmix64(stable_hash(id) ^ seed ^ round)`` mapped to [0,1), not
    an RNG stream, so sampling is independent of block order. Every
    corpus pass is one shuffle-free ``map_batches`` with the current
    centers broadcast via ``ray.put``; only (candidate, φ-partial) rows
    ever reach the driver — the corpus is never collected. Complements
    the degenerate-but-oracle-stable smallest-id init of
    :func:`ivf_assign_counts` with a quality seeding for real
    clustering.
    """
    if oversample is None:
        oversample = 2 * k
    sel = ds.select_columns([id_column, vector_column])

    # starting center: the globally smallest-hash row (per-block min,
    # tiny driver fold — no global sort)
    def local_min(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "v": tbl.column(vector_column).slice(0, 0)})
        h = _id_hash_u64(tbl.column(id_column), seed)
        j = int(np.argmin(h))
        return pa.table({"h": pa.array([int(h[j] >> np.uint64(1))]),
                         "v": tbl.column(vector_column).slice(j, 1)})

    cand = sorted(
        sel.map_batches(local_min, batch_format="pyarrow",
                        zero_copy_batch=True).take_all(),
        key=lambda r: r["h"])
    if not cand:
        raise ValueError("cannot seed k-means on an empty dataset")
    c0 = np.asarray(cand[0]["v"], dtype=np.float64)
    C = _normalize(c0[None, :]) if spherical else c0[None, :].copy()
    d = C.shape[1]

    out_schema = pa.schema([
        ("is_phi", pa.bool_()), ("val", pa.float64()),
        ("vec", pa.list_(pa.float64(), d))])

    phi = None
    for rnd in range(rounds + 1):
        ref = ray.put(C)
        phi_prev = phi
        sample_this_round = rnd > 0  # round 0 only measures φ

        def passer(tbl: pa.Table) -> pa.Table:
            X = _matrix(tbl, vector_column)
            if X.shape[0] == 0:
                return out_schema.empty_table()
            Cc = ray.get(ref)
            if spherical:
                Xw = _normalize(X)
                d2 = np.maximum(2.0 - 2.0 * (Xw @ Cc.T).max(axis=1), 0.0)
            else:
                Xw = X
                best = (Xw @ Cc.T - 0.5 * (Cc * Cc).sum(axis=1)).max(axis=1)
                d2 = np.maximum((Xw * Xw).sum(axis=1) - 2.0 * best, 0.0)
            rows_phi = pa.table({
                "is_phi": pa.array([True]),
                "val": pa.array([float(d2.sum())]),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.zeros(d)), d),
            })
            if not sample_this_round or not phi_prev:
                return rows_phi.cast(out_schema)
            u = _id_hash_u64(tbl.column(id_column),
                             seed ^ (0x9E37 + rnd)).astype(np.float64)
            u /= float(2 ** 64)
            p = np.minimum(1.0, oversample * d2 / phi_prev)
            pick = np.flatnonzero(u < p)
            if pick.size == 0:
                return rows_phi.cast(out_schema)
            rows_s = pa.table({
                "is_phi": pa.array([False] * pick.size),
                "val": pa.array(np.zeros(pick.size)),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(Xw[pick].ravel()), d),
            })
            return pa.concat_tables([rows_phi.cast(out_schema),
                                     rows_s.cast(out_schema)])

        rows = sel.map_batches(passer, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
        phi = sum(r["val"] for r in rows if r["is_phi"])
        new = [np.asarray(r["vec"], dtype=np.float64)
               for r in rows if not r["is_phi"]]
        if new:
            C = np.vstack([C, np.asarray(new)])
            # dedupe exact repeats (a point sampled in two rounds)
            C = np.unique(C, axis=0)
        if phi == 0:
            break  # every point coincides with a center already

    if C.shape[0] < k:
        raise ValueError(
            f"k-means|| sampled only {C.shape[0]} candidates < k={k}; "
            "raise oversample or rounds")

    # weight candidates by population, then recluster locally
    ref = ray.put(C)
    nc = C.shape[0]

    def weigh(tbl: pa.Table) -> pa.Table:
        X = _matrix(tbl, vector_column)
        if X.shape[0] == 0:
            return pa.table({"cid": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        Cc = ray.get(ref)
        Xw = _normalize(X) if spherical else X
        if spherical:
            assign = np.argmax(Xw @ Cc.T, axis=1)
        else:
            assign = np.argmax(Xw @ Cc.T - 0.5 * (Cc * Cc).sum(axis=1),
                               axis=1)
        counts = np.bincount(assign, minlength=nc)
        nz = np.flatnonzero(counts)
        return pa.table({"cid": pa.array(nz.astype(np.int64)),
                         "n": pa.array(counts[nz].astype(np.int64))})

    w = np.zeros(nc, dtype=np.float64)
    for r in sel.map_batches(weigh, batch_format="pyarrow",
                             zero_copy_batch=True).take_all():
        w[r["cid"]] += r["n"]
    w = np.maximum(w, 1e-12)  # keep zero-population candidates pickable
    return _weighted_kmeans_local(C, w, k, seed=seed, iters=local_iters,
                                  spherical=spherical)


def ivf_assign_counts(
    ds: ray.data.Dataset,
    *,
    ncentroids: int = 8,
    refine_iters: int = 1,
    id_column: str = "vec_id",
    vector_column: str = "embedding",
    init: str = "min_id",
    seed: int = 0,
) -> pa.Table:
    """Cluster-population table after distributed k-means refinement.

    Deterministic end-to-end: initial centroids are the ``ncentroids``
    rows with the smallest ids (normalized), refined with
    :func:`kmeans_refine` for ``refine_iters`` Lloyd iterations, then
    one final assignment pass counts members per centroid. Returns
    ``(centroid_id, n_members)`` for non-empty centroids —
    integer-valued, so the DuckDB oracle reproduces it exactly (argmax
    assignment is float-robust; only counts are compared).
    """
    # init strategies (``init=``):
    #   min_id (default)  — the ncentroids smallest-id rows. Degenerate
    #     for real clustering but fully integer-deterministic, which the
    #     SQL oracle depends on; NEVER change the default's semantics.
    #   random_hash       — the ncentroids smallest stable-hash(id)^seed
    #     rows: a deterministic pseudo-random draw, same per-block
    #     min-k shape.
    #   kmeans_par        — k-means|| seeding (kmeans_parallel_init).
    # min-k WITHOUT a global sort: each block keeps its local min-k
    # (<= ncentroids rows per block reach the driver), then one tiny
    # driver-side merge — same result as sort(key).limit(k) at none of
    # the all-to-all cost
    import pyarrow.compute as pc

    if init == "kmeans_par":
        C0 = kmeans_parallel_init(
            ds, ncentroids, id_column=id_column,
            vector_column=vector_column, seed=seed, spherical=True)
    elif init in ("min_id", "random_hash"):
        def local_mink(tbl: pa.Table) -> pa.Table:
            t = tbl.select([id_column, vector_column])
            if init == "random_hash":
                key = pa.array((_id_hash_u64(t.column(id_column), seed)
                                >> np.uint64(1)).astype(np.int64))
                t = t.append_column("sort_key", key)
            else:
                t = t.append_column("sort_key", t.column(id_column))
            if t.num_rows <= ncentroids:
                return t
            order = pc.sort_indices(t.column("sort_key"))
            return t.take(order.slice(0, ncentroids))

        cand = (ds.map_batches(local_mink, batch_format="pyarrow",
                               zero_copy_batch=True).take_all())
        cand.sort(key=lambda r: r["sort_key"])
        init_rows = cand[:ncentroids]
        if not init_rows:
            raise ValueError("cannot train centroids on an empty dataset")
        C0 = _normalize(np.asarray(
            [np.asarray(r[vector_column], dtype=np.float64)
             for r in init_rows]))
    else:
        raise ValueError(
            f"unknown init {init!r} (min_id, random_hash, kmeans_par)")
    C = kmeans_refine(ds, C0, iters=refine_iters,
                      vector_column=vector_column, spherical=True)
    k = C.shape[0]
    ref = ray.put(C)

    def partial(tbl: pa.Table) -> pa.Table:
        X = _matrix(tbl, vector_column)
        if X.shape[0] == 0:
            return pa.table({"cid": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        assign = np.argmax(_normalize(X) @ ray.get(ref).T, axis=1)
        counts = np.bincount(assign, minlength=k)
        nz = np.flatnonzero(counts)
        return pa.table({"cid": pa.array(nz.astype(np.int64)),
                         "c": pa.array(counts[nz].astype(np.int64))})

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    counts = np.zeros(k, dtype=np.int64)
    for r in rows:
        counts[r["cid"]] += r["c"]
    nz = np.flatnonzero(counts)
    return pa.table({
        "centroid_id": pa.array(nz.astype(np.int64)),
        "n_members": pa.array(counts[nz].astype(np.int64)),
    })
