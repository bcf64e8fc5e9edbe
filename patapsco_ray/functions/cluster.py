"""Connected-component clustering of near-duplicate pairs + corpus dedup.

Pair-producing operators (:mod:`.dedup`) list near-duplicate EDGES;
an actual training-data pipeline must then pick one survivor per
duplicate CLUSTER (the transitive closure of the pairs) and drop the
rest. Two operators:

- :func:`connected_components` — (id, root) for every id that appears
  in a pair, root = lexicographic min of the component. Small edge
  sets (the common case: near-dup pairs are a small fraction of the
  corpus) resolve with a driver-side union-find; above
  ``driver_threshold`` the alternating large-star/small-star algorithm
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14) runs as pure Ray Data groupby rounds — O(log d) rounds,
  nothing ever materializes more than the edge set.
- :func:`dedup_keep` — drop every non-root member from the corpus:
  broadcast the drop set (``ray.put`` once, read per batch) when it is
  small, else a hash-partitioned left-anti join.
- :func:`near_dedup` — end-to-end: pairs -> components -> kept docs.

The reference has no clustering stage (its pipelines never dedup,
docs.py keeps every record); this extends the engine for the
training-data use case.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Min

__all__ = ["connected_components", "dedup_keep", "near_dedup"]


# ------------------------------------------------------------ components


def _driver_components(t: pa.Table) -> pa.Table:
    """Vectorized driver-side components over an edge table (u, v):
    dictionary-encode endpoints to int codes, then alternate numpy
    edge relaxation (min-label across each edge) with pointer jumping
    until fixpoint — O(E) numpy work per round, O(log n) rounds, no
    Python-per-edge loop. Labels are ranks in the natural (ascending)
    id order, so the fixpoint label of a component is its minimum id.
    Returns (id, root) sorted by id."""
    u = t.column("u").combine_chunks()
    v = t.column("v").combine_chunks()
    enc = pa.concat_arrays([u, v]).dictionary_encode()
    codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                       dtype=np.int64)
    nodes = enc.dictionary
    nn = len(nodes)
    m = t.num_rows
    cu, cv = codes[:m], codes[m:]
    node_of_rank = np.asarray(
        pc.sort_indices(nodes).to_numpy(zero_copy_only=False),
        dtype=np.int64)
    rank = np.empty(nn, dtype=np.int64)
    rank[node_of_rank] = np.arange(nn, dtype=np.int64)
    label = rank.copy()
    while True:
        prev = label.copy()
        mn = np.minimum(label[cu], label[cv])
        np.minimum.at(label, cu, mn)
        np.minimum.at(label, cv, mn)
        # pointer jump: adopt the (never larger) label of the node
        # currently holding your label's rank
        np.minimum(label, label[node_of_rank[label]], out=label)
        if np.array_equal(label, prev):
            break
    order = node_of_rank  # ascending id order
    ids = nodes.take(pa.array(order))
    roots = nodes.take(pa.array(node_of_rank[label[order]]))
    return pa.table({"id": ids, "root": roots})


def _distinct_edges(edges: ray.data.Dataset, schema: pa.Schema
                    ) -> ray.data.Dataset:
    """Distinct (u, v) rows via a 128-bit edge-hash group key.

    Grouping directly on two string columns sort-shuffles the string
    payloads (measured ~12 min for 6M string-pair rows — and this
    dedup runs once per star round); two int64 hash keys sort in a
    fraction of that, and rows within a (k1, k2) group are identical
    up to a 2^-128-grade collision, so native Min aggregates recover
    (u, v) without any per-group Python."""
    from .hashing import hash_strings, splitmix64
    from .windows import _pin

    def _edge_hash(col: pa.ChunkedArray, seed: int) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(
                col.type):
            return hash_strings(col, seed=seed)
        ints = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return splitmix64(ints + np.uint64(seed))

    def keyed(t: pa.Table) -> pa.Table:
        key_schema = pa.schema([("k1", pa.int64()), ("k2", pa.int64()),
                                ("u", schema.field("u").type),
                                ("v", schema.field("v").type)])
        if t.num_rows == 0:
            return key_schema.empty_table()
        with np.errstate(over="ignore"):
            hu1 = _edge_hash(t.column("u"), 101)
            hv1 = _edge_hash(t.column("v"), 103)
            hu2 = _edge_hash(t.column("u"), 107)
            hv2 = _edge_hash(t.column("v"), 109)
            k1 = splitmix64(hu1 * np.uint64(0x9E3779B97F4A7C15) ^ hv1)
            k2 = splitmix64(hu2 ^ (hv2 * np.uint64(0xC2B2AE3D27D4EB4F)))
        return pa.table({
            "k1": pa.array(k1.view(np.int64)),
            "k2": pa.array(k2.view(np.int64)),
            "u": t.column("u"), "v": t.column("v"),
        }, schema=key_schema)

    agg = (edges.map_batches(keyed, batch_format="pyarrow")
           .groupby(["k1", "k2"]).aggregate(Min("u"), Min("v")))

    def fin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        return pa.table({"u": t.column("min(u)"),
                         "v": t.column("min(v)")}, schema=schema)

    return agg.map_batches(fin, batch_format="pyarrow").map_batches(
        _pin(schema), batch_format="pyarrow")


# below this many edges the per-node-call map_groups star is cheap and
# the join-vectorized star is NOT safe: Ray's hash-join partitions a
# tiny input into empty blocks whose schema-less batches crash acero
# ("No match for FieldRef"); at >= this size every join partition
# holds thousands of rows and the vectorized path is the one that
# scales (module-level so tests can force either path)
_VEC_STAR_MIN_EDGES = 500_000


def _star_round(edges: ray.data.Dataset, edge_schema: pa.Schema,
                n_edges: int) -> ray.data.Dataset:
    if n_edges >= _VEC_STAR_MIN_EDGES:
        return _star_round_vec(edges, edge_schema)
    return _star_round_groups(edges, edge_schema)


def _star_round_vec(edges: ray.data.Dataset, edge_schema: pa.Schema,
                    num_partitions: int | None = None) -> ray.data.Dataset:
    """One large-star + small-star round (Kiveris et al. SoCC'14 §3),
    fully VECTORIZED: each star is a native ``groupby(u).min(v)``
    aggregate (no per-group Python — a ``map_groups`` star paid one
    interpreter call per NODE per round, ~18 min at 1M nodes) plus one
    hash join attaching the per-node minimum back onto the edges.

    - large-star: over the symmetric edge set, m(u) = min(N(u) + {u});
      emit (v, m(u)) for every neighbor v > u.
    - small-star: orient edges high->low, m(u) = min(N(u)) (all
      neighbors are < u after orienting); emit (v, m(u)) for
      v in N(u), v != m(u), plus (u, m(u)).
    """
    idt = edge_schema.field("u").type
    if num_partitions is None:
        # the hash-join operator spawns aggregator actors per
        # partition: oversubscribing a small cluster (32 partitions at
        # 4 CPUs) deadlocks the tiny-data case, so size to the cluster
        num_partitions = max(
            2, min(32, int(ray.cluster_resources().get("CPU", 4)) // 2))

    def _empty() -> pa.Table:
        return edge_schema.empty_table()

    def bidir(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty()
        rev = pa.table({"u": t.column("v"), "v": t.column("u")})
        return pa.concat_tables([t.select(["u", "v"]), rev])

    min_schema = pa.schema([("u", idt), ("m", idt)])

    def node_mins(e: ray.data.Dataset, clamp_self: bool
                  ) -> ray.data.Dataset:
        # group on a 128-bit hash of the node id, not the (string) id
        # itself: the sort-based aggregate shuffle over string keys is
        # the same pathology _distinct_edges documents; all rows in a
        # (h1, h2) group share one u, so Min("u") recovers it
        from .hashing import hash_strings, splitmix64

        def keyed(t: pa.Table) -> pa.Table:
            ks = pa.schema([("h1", pa.int64()), ("h2", pa.int64()),
                            ("u", idt), ("v", idt)])
            if t.num_rows == 0:
                return ks.empty_table()
            col = t.column("u")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_string(col.type) or pa.types.is_large_string(
                    col.type):
                h1 = hash_strings(col, seed=211)
                h2 = hash_strings(col, seed=223)
            else:
                ints = col.to_numpy(zero_copy_only=False).astype(np.uint64)
                h1 = splitmix64(ints + np.uint64(211))
                h2 = splitmix64(ints + np.uint64(223))
            return pa.table({"h1": pa.array(h1.view(np.int64)),
                             "h2": pa.array(h2.view(np.int64)),
                             "u": t.column("u"), "v": t.column("v")},
                            schema=ks)

        agg = (e.map_batches(keyed, batch_format="pyarrow")
               .groupby(["h1", "h2"]).aggregate(Min("u"), Min("v")))

        def fin(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return min_schema.empty_table()
            u = t.column("min(u)")
            m = t.column("min(v)")
            if clamp_self:
                m = pc.min_element_wise(m, u)
            return pa.table({"u": u, "m": m}, schema=min_schema)

        return agg.map_batches(fin, batch_format="pyarrow")

    def orient(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty()
        hi = pc.max_element_wise(t.column("u"), t.column("v"))
        lo = pc.min_element_wise(t.column("u"), t.column("v"))
        return pa.table({"u": hi, "v": lo})

    # ---- large star ----
    sym = edges.map_batches(bidir, batch_format="pyarrow").materialize()
    lmins = node_mins(sym, clamp_self=True)
    joined = sym.join(lmins, join_type="inner", on=("u",),
                      num_partitions=num_partitions)

    def large_emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty()
        keep = pc.greater(t.column("v"), t.column("u"))
        sub = t.filter(keep)
        return pa.table({"u": sub.column("v"), "v": sub.column("m")},
                        schema=edge_schema)

    large = joined.map_batches(large_emit, batch_format="pyarrow")

    # ---- small star ----
    ori = large.map_batches(orient, batch_format="pyarrow").materialize()
    smins = node_mins(ori, clamp_self=False)  # neighbors all < u
    sjoined = ori.join(smins, join_type="inner", on=("u",),
                       num_partitions=num_partitions)

    def small_emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty()
        keep = pc.invert(pc.equal(t.column("v"), t.column("m")))
        sub = t.filter(keep)
        return pa.table({"u": sub.column("v"), "v": sub.column("m")},
                        schema=edge_schema)

    small_nbrs = sjoined.map_batches(small_emit, batch_format="pyarrow")

    # the (u, m(u)) edges come straight from the mins table; u == m
    # (already-rooted nodes) must NOT emit a self loop — the original
    # per-group star skipped them, and a (m, m) edge would later
    # duplicate the root's (id, root) output row
    def self_edges_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty()
        sub = t.filter(pc.invert(pc.equal(t.column("u"), t.column("m"))))
        return pa.table({"u": sub.column("u"), "v": sub.column("m")},
                        schema=edge_schema)

    self_edges = smins.map_batches(self_edges_fn, batch_format="pyarrow")
    return _distinct_edges(small_nbrs.union(self_edges), edge_schema)


def _star_round_groups(edges: ray.data.Dataset, edge_schema: pa.Schema
                       ) -> ray.data.Dataset:
    """The per-node ``map_groups`` star round: one Python call per node
    per round — fine below ``_VEC_STAR_MIN_EDGES``, where the
    join-vectorized round cannot run safely (see the constant)."""
    idt = edge_schema.field("u").type

    def _empty() -> pa.Table:
        return edge_schema.empty_table()

    def bidir(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty()
        rev = pa.table({"u": t.column("v"), "v": t.column("u")})
        return pa.concat_tables([t.select(["u", "v"]), rev])

    def large_star(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return _empty()
        u = grp.column("u")[0].as_py()
        v = grp.column("v")
        m = min(pc.min(v).as_py(), u)
        out_v = v.filter(pc.greater(v, pa.scalar(u, idt)))
        if len(out_v) == 0:
            return _empty()
        return pa.table({"u": out_v,
                         "v": pa.array([m] * len(out_v), idt)})

    def orient(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty()
        hi = pc.max_element_wise(t.column("u"), t.column("v"))
        lo = pc.min_element_wise(t.column("u"), t.column("v"))
        return pa.table({"u": hi, "v": lo})

    def small_star(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return _empty()
        u = grp.column("u")[0].as_py()
        v = grp.column("v")  # all <= u after orient
        m = min(pc.min(v).as_py(), u)
        out_v = v.filter(pc.invert(pc.equal(v, pa.scalar(m, idt))))
        heads = out_v.to_pylist() + ([u] if u != m else [])
        if not heads:
            return _empty()
        return pa.table({"u": pa.array(heads, idt),
                         "v": pa.array([m] * len(heads), idt)})

    sym = edges.map_batches(bidir, batch_format="pyarrow")
    large = sym.groupby("u").map_groups(large_star, batch_format="pyarrow")
    ori = large.map_batches(orient, batch_format="pyarrow")
    small = ori.groupby("u").map_groups(small_star, batch_format="pyarrow")
    return _distinct_edges(small, edge_schema)


def connected_components(
    pairs: ray.data.Dataset,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    driver_threshold: int = 25_000_000,
    max_rounds: int = 16,
) -> ray.data.Dataset:
    """(id, root) for every id appearing in ``pairs``; root is the
    lexicographic minimum of the connected component.

    Edge sets up to ``driver_threshold`` rows resolve on the driver
    with the VECTORIZED numpy path (dictionary-encode + min-label
    relaxation + pointer jumping; measured 8.5 s / ~1.5 GB at 5M
    string edges — the threshold is sized so a 25M-edge set stays
    under ~10 GB and ~1 min). Larger sets run alternating star rounds
    of groupby dataflow until the edge set reaches a fixed point
    (star graphs rooted at component minima), checked by an
    order-independent checksum. The star rounds pay one Python
    ``map_groups`` call per NODE per round (measured ~18 min at 6.1M
    edges / ~1M nodes), so prefer the driver path whenever the edge
    projection fits driver memory — near-dup edge sets are a small
    fraction of the corpus even at web scale.

    The (id, id) edge projection is materialized ONCE up front — it is
    tiny relative to the pair stage that produced it, and everything
    downstream (count, schema, union-find read, star rounds) would
    otherwise re-execute that expensive upstream pipeline.
    """
    edges = pairs.select_columns([id_a, id_b]).rename_columns(
        {id_a: "u", id_b: "v"}).filter(expr="u != v").materialize()
    schema = edges.schema()
    if schema is not None:
        id_type = schema.base_schema.field("u").type
    else:  # fully-empty materialized dataset reports no schema
        src = pairs.schema()
        id_type = (src.base_schema.field(id_a).type
                   if src is not None else pa.string())
    edge_schema = pa.schema([("u", id_type), ("v", id_type)])
    n = edges.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.table({"id": pa.array([], id_type),
                      "root": pa.array([], id_type)}))
    if n <= driver_threshold:
        t = pa.concat_tables(
            edges.iter_batches(batch_format="pyarrow")).combine_chunks()
        return ray.data.from_arrow(_driver_components(t))

    from .hashing import hash_strings, splitmix64

    def _col_hash(col: pa.ChunkedArray, seed: int) -> np.ndarray:
        col = col.combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            return hash_strings(col, seed=seed)
        ints = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return splitmix64(ints + np.uint64(seed))

    def _checksum(e: ray.data.Dataset) -> tuple[int, int]:
        def h(t: pa.Table) -> pa.Table:
            hu = _col_hash(t.column("u"), 11)
            hv = _col_hash(t.column("v"), 13)
            mix = ((hu * np.uint64(0x9E3779B97F4A7C15)) ^ hv) >> np.uint64(1)
            return pa.table({"h": pa.array(mix.astype(np.int64))})

        hs = e.map_batches(h, batch_format="pyarrow")
        return e.count(), int(hs.sum("h") or 0)

    # a few-block edge set serializes every downstream sort/aggregate
    # map side (one 6M-row block = one single-threaded sort task):
    # spread it so each shuffle round has real map-side parallelism
    cpus = int(ray.cluster_resources().get("CPU", 4))
    target_blocks = min(max(2 * cpus, 8), max(n // 100_000, 1))
    if edges.num_blocks() < target_blocks:
        edges = edges.repartition(target_blocks).materialize()
    edges = _distinct_edges(edges, edge_schema).materialize()
    prev = _checksum(edges)
    for _ in range(max_rounds):
        edges = _star_round(edges, edge_schema, prev[0]).materialize()
        cur = _checksum(edges)
        if cur == prev:
            break
        prev = cur
    # fixed point: every edge is (member, root); add (root, root) rows
    # so both resolution paths return every node of the pair graph
    members = edges.rename_columns({"u": "id", "v": "root"})

    def self_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"id": pa.array([], id_type),
                             "root": pa.array([], id_type)})
        return pa.table({"id": t.column("v"), "root": t.column("v")})

    roots = (edges.groupby("v").aggregate(Count())
             .map_batches(self_rows, batch_format="pyarrow"))
    return members.union(roots)


# ------------------------------------------------------------------ keep


def dedup_keep(
    docs: ray.data.Dataset,
    components: ray.data.Dataset,
    *,
    id_column: str = "doc_id",
    broadcast_threshold: int = 5_000_000,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Drop every document whose component root is not itself.

    The drop set (non-root members) is broadcast via ``ray.put`` once
    and probed per batch with a sorted-array ``np.searchsorted`` when
    it fits (``broadcast_threshold``); otherwise a hash-partitioned
    ``left_anti`` join — never a driver-side row loop over the corpus.
    """
    drops = components.filter(expr="id != root").select_columns(["id"])
    n_drop = drops.count()
    if n_drop == 0:
        return docs
    if n_drop <= broadcast_threshold:
        arr = np.sort(np.concatenate([
            b.column("id").to_numpy(zero_copy_only=False)
            for b in drops.iter_batches(batch_format="pyarrow")]))
        ref = ray.put(arr)

        def keep(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:  # schema-less empty shuffle blocks
                return t
            d = ray.get(ref)
            ids = t.column(id_column).to_numpy(zero_copy_only=False)
            pos = np.searchsorted(d, ids)
            pos = np.minimum(pos, len(d) - 1)
            return t.filter(pa.array(d[pos] != ids))

        return docs.map_batches(keep, batch_format="pyarrow")
    from .windows import _field_type, _pin

    idt = _field_type(docs, id_column)
    pinned = drops.rename_columns({"id": id_column}).map_batches(
        _pin(pa.schema([(id_column, idt)])), batch_format="pyarrow")
    return docs.join(pinned, join_type="left_anti",
                     num_partitions=num_partitions, on=(id_column,))


def near_dedup(
    docs: ray.data.Dataset,
    *,
    method: str = "minhash",
    id_column: str = "doc_id",
    text_column: str = "text",
    **kwargs,
) -> ray.data.Dataset:
    """End-to-end near-duplicate removal: pairs (``method`` in
    {minhash, jaccard, exact, simhash}) -> connected components ->
    surviving documents. ``kwargs`` pass through to the pair stage."""
    from . import dedup as _d

    if method == "minhash":
        pairs = _d.minhash_lsh_pairs(
            docs, id_column=id_column, text_column=text_column, **kwargs)
    elif method == "jaccard":
        pairs = _d.ngram_jaccard_pairs(
            docs, id_column=id_column, text_column=text_column, **kwargs)
    elif method == "simhash":
        pairs = _d.simhash_pairs(
            docs, id_column=id_column, text_column=text_column, **kwargs)
    elif method == "exact":
        pairs = _d.exact_duplicate_pairs(
            docs, id_column=id_column, text_column=text_column)
    else:
        raise ValueError(f"unknown near_dedup method {method!r}")
    comps = connected_components(pairs)
    return dedup_keep(docs, comps, id_column=id_column)
