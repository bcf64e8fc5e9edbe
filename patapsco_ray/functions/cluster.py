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
from ray.data.aggregate import Count

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
    from .windows import _pin

    agg = edges.groupby(["u", "v"]).aggregate(Count())
    return agg.drop_columns(["count()"]).map_batches(
        _pin(schema), batch_format="pyarrow")


def _star_round(edges: ray.data.Dataset, edge_schema: pa.Schema
                ) -> ray.data.Dataset:
    """One large-star + small-star round (Kiveris et al. SoCC'14 §3).

    Each star is one ``groupby(node).map_groups`` — the group IS the
    node's neighborhood, so the per-node min and the emitted edges are
    computed in place with Arrow kernels; no join stage (a
    two-sided hash join would re-shuffle the same edge set a second
    time for data the group already holds).

    - large-star: over the symmetric edge set, m(u) = min(N(u) + {u});
      emit (v, m(u)) for every neighbor v > u.
    - small-star: orient edges high->low, m(u) = min(N(u) + {u});
      emit (v, m(u)) for v in N(u), v != m(u), plus (u, m(u)).
    """
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

    edges = _distinct_edges(edges, edge_schema).materialize()
    prev = _checksum(edges)
    for _ in range(max_rounds):
        edges = _star_round(edges, edge_schema).materialize()
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
