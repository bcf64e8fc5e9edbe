"""Deduplication operators over a document table (id, text).

Four families, each a Ray Data dataflow designed for the 100 TB case:

- :func:`exact_duplicates` — 128-bit content hash inside
  ``map_batches`` (only the hash + id cross the shuffle, never the
  text), then ``groupby(hash)`` with Min/Count aggregates.
- :func:`ngram_jaccard_pairs` — exact Jaccard over distinct w-token
  shingles via a shingle inverted index: explode (doc, shingle),
  ``groupby(shingle)`` emits co-occurrence pairs (df-capped to bound
  the quadratic head), ``groupby(pair)`` counts intersections, sizes
  joined back. SQL-reproducible (the DuckDB oracle runs the same plan).
- :func:`minhash_lsh_pairs` — MinHash signatures (vectorized over the
  flattened shingle-hash array) banded into LSH buckets;
  ``groupby(bucket)`` emits candidate pairs scored by signature
  agreement. Approximate, near-linear — the scale path.
- :func:`simhash_pairs` — 64-bit SimHash with 16-bit band bucketing
  and exact Hamming verification.

Skew note: the df/bucket caps bound the all-pairs blowup of head
shingles/buckets (Zipf head terms co-occur everywhere); every capped
stage logs a WARNING per dropped group with its size, so a run that
dropped candidate mass is visibly flagged instead of silently exact-
looking. The caps default to the same ~2000 order everywhere
(``max_shingle_df`` / ``max_bucket``) — a head group at the cap emits
~2M pairs, the worst single-task unit we allow.
"""

from __future__ import annotations

import binascii
import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Min

from .hashing import combine_hashes, hash_strings, splitmix64, window_hashes
from .textstats import _seg_count, _tokens

_U64 = np.uint64

_LOG = logging.getLogger(__name__)

# upper bound on pair-index entries materialized per emission chunk in
# ngram_jaccard_pairs (module-level so tests can shrink it)
_CHUNK_PAIRS = 1 << 21


def _hash128_hex(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """128-bit content hash per string as a 32-char hex Arrow string
    column, fully vectorized (two 64-bit hashes -> big-endian bytes ->
    one hexlify -> zero-copy StringArray from offsets)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if n == 0:
        return pa.array([], pa.string())
    buf = np.empty((n, 2), dtype=">u8")
    buf[:, 0] = hash_strings(texts, seed=1)
    buf[:, 1] = hash_strings(texts, seed=2)
    hexbytes = binascii.hexlify(buf.tobytes())
    offsets = np.arange(0, 32 * (n + 1), 32, dtype=np.int32)
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(offsets.tobytes()), pa.py_buffer(hexbytes))

# 16-bit popcount table (numpy<2 lacks bitwise_count)
_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    v = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint16)
    return _POP16[v].reshape(len(x), 4).sum(axis=1).astype(np.int64)


def _scaled(x: np.ndarray, scale: float = 1e6) -> np.ndarray:
    """floor(x*scale + 0.5) as int64 — the float-compare convention
    shared with the DuckDB oracles."""
    return np.floor(x * scale + 0.5).astype(np.int64)


# ---------------------------------------------------------------- exact


def exact_duplicates(
    ds: ray.data.Dataset, *, id_column: str = "doc_id", text_column: str = "text"
) -> ray.data.Dataset:
    """Exact-duplicate groups -> (keep_id, n_copies), one row per
    distinct text; keep_id is the minimum id of the group.

    The shuffle moves only (hash128, id): texts are hashed to a 128-bit
    key in the map stage (collision probability ~n^2/2^128).
    """

    def add_hash(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {"text_hash": _hash128_hex(tbl.column(text_column)),
             id_column: tbl.column(id_column)}
        )

    agg = (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_hash")
        .aggregate(Min(id_column), Count())
    )
    return agg.map_batches(
        lambda t: pa.table(
            {"keep_id": t.column(f"min({id_column})"),
             "n_copies": t.column("count()")}
        ),
        batch_format="pyarrow",
    )


def exact_duplicate_pairs(
    ds: ray.data.Dataset, *, id_column: str = "doc_id", text_column: str = "text"
) -> ray.data.Dataset:
    """Exact-duplicate EDGES (id_a=group min, id_b=other member), one
    row per non-canonical member — the pair form consumed by
    :func:`..cluster.connected_components` / ``dedup_keep`` (already a
    star graph, so clustering converges in one look). Same shuffle
    footprint as :func:`exact_duplicates`: only (hash128, id) moves.
    """

    def add_hash(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {"text_hash": _hash128_hex(tbl.column(text_column)),
             "id": tbl.column(id_column)}
        )

    def emit(grp: pa.Table) -> pa.Table:
        ids = grp.column("id")
        if grp.num_rows < 2:
            return pa.table({"id_a": pa.array([], ids.type),
                             "id_b": pa.array([], ids.type)})
        lo = pc.min(ids)
        keep = pc.invert(pc.equal(ids, lo))
        others = ids.filter(keep)
        return pa.table({
            "id_a": pa.array([lo.as_py()] * len(others), ids.type),
            "id_b": others.combine_chunks() if isinstance(
                others, pa.ChunkedArray) else others,
        })

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_hash")
        .map_groups(emit, batch_format="pyarrow")
    )


# ------------------------------------------------------- n-gram Jaccard


def _distinct_shingles(tbl: pa.Table, id_column: str, text_column: str, w: int
                       ) -> tuple[pa.Array, pa.Array]:
    """Per-row distinct w-token shingle strings -> (ids_repeated,
    shingles, owner_set_sizes) flat arrays."""
    texts = tbl.column(text_column)
    flat, parent, nonempty = _tokens(texts)
    n = tbl.num_rows
    counts = _seg_count(parent, nonempty, n)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    kept = flat.filter(pa.array(nonempty)) if parent.size else flat
    total = int(offsets[-1])
    if total == 0:
        return (pa.array([], tbl.column(id_column).type),
                pa.array([], pa.string()), np.empty(0, dtype=np.int64))
    nwin = max(total - w + 1, 0)
    starts = np.arange(nwin, dtype=np.int64)
    doc_of = np.searchsorted(offsets, starts, side="right") - 1
    valid = starts + w <= offsets[doc_of + 1]
    vstarts = starts[valid]
    vdocs = doc_of[valid]
    if vstarts.size:
        parts = [kept.take(pa.array(vstarts + j)) for j in range(w)]
        sep = pa.array([" "] * len(vstarts), pa.string())
        shing = pc.binary_join_element_wise(*parts, sep)
    else:
        shing = pa.array([], pa.string())
    # short docs (0 < len < w): the whole doc is one shingle
    doc_lens = np.diff(offsets)
    short = np.flatnonzero((doc_lens > 0) & (doc_lens < w))
    if short.size:
        extra = []
        for d in short:
            seg = kept.slice(offsets[d], doc_lens[d]).to_pylist()
            extra.append(" ".join(seg))
        shing = pa.concat_arrays([shing.combine_chunks() if isinstance(
            shing, pa.ChunkedArray) else shing, pa.array(extra, pa.string())])
        vdocs = np.concatenate([vdocs, short])
    # distinct (doc, shingle)
    if len(shing) == 0:
        return (pa.array([], tbl.column(id_column).type), shing,
                np.empty(0, dtype=np.int64))
    sh_arr = shing.combine_chunks() if isinstance(shing, pa.ChunkedArray) else shing
    h = hash_strings(sh_arr, seed=3)
    order = np.lexsort((h, vdocs))
    vd, hh = vdocs[order], h[order]
    first = np.ones(vd.size, dtype=bool)
    if vd.size > 1:
        first[1:] = (vd[1:] != vd[:-1]) | (hh[1:] != hh[:-1])
    sel = order[first]
    vdocs_sel = vdocs[order][first]
    ids = tbl.column(id_column).take(pa.array(vdocs_sel))
    # per-row distinct-shingle count of the owning doc: each doc lives
    # in exactly one batch, so this is its full set size
    cnt = np.bincount(vdocs_sel, minlength=n)
    return ids, sh_arr.take(pa.array(sel)), cnt[vdocs_sel].astype(np.int64)


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    shingle_size: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int = 2000,
) -> ray.data.Dataset:
    """Exact n-gram-Jaccard near-duplicate pairs.

    Returns (id_a, id_b, n_common, n_a, n_b, jaccard_1e6) for pairs
    with Jaccard >= threshold over distinct ``shingle_size``-token
    shingles (docs shorter than the shingle size contribute their whole
    token sequence as one shingle). Shingles with document frequency >
    ``max_shingle_df`` are excluded from pair GENERATION (quadratic-head
    cap — a group AT the cap already emits ~2M pair rows, the largest
    single-task unit we allow) but still count toward per-doc sizes, so
    a computed Jaccard is a lower bound whenever a drop happened; every
    dropped shingle group is logged as a WARNING with its df. Groups
    under the cap emit their pair rows in bounded sub-chunks so peak
    task memory stays ~O(chunk), not O(df^2), even when the cap is
    raised.

    Join-free dataflow: per-doc set sizes are computed at explode time
    (a doc's distinct shingles all come from its one batch) and ride
    the shingle shuffle as an int64 column, so pair rows already carry
    (n_a, n_b) — no sizes table, no hash joins (which also emit
    schema-less empty partitions at small scale that crash acero).
    """
    from .windows import _field_type, _pin

    # captured at call time so the closure ships the driver's value
    # (tests shrink it to exercise multi-chunk emission)
    chunk_pairs = _CHUNK_PAIRS
    idt = _field_type(ds, id_column)
    pair_schema = pa.schema([("id_a", idt), ("id_b", idt),
                             ("n_a", pa.int64()), ("n_b", pa.int64())])
    counted_schema = pa.schema([
        ("id_a", idt), ("id_b", idt), ("n_common", pa.int64()),
        ("n_a", pa.int64()), ("n_b", pa.int64())])
    out_schema = pa.schema([
        ("id_a", idt), ("id_b", idt), ("n_common", pa.int64()),
        ("n_a", pa.int64()), ("n_b", pa.int64()),
        ("jaccard_1e6", pa.int64())])

    def explode(tbl: pa.Table) -> pa.Table:
        ids, shing, sizes = _distinct_shingles(
            tbl, id_column, text_column, shingle_size)
        return pa.table({"id": ids, "shingle": shing,
                         "n": pa.array(sizes)})

    shingles = ds.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )

    def emit_pairs(grp: pa.Table) -> pa.Table:
        m = grp.num_rows
        if m < 2:
            return pair_schema.empty_table()
        if m > max_shingle_df:
            _LOG.warning(
                "ngram_jaccard_pairs: dropping shingle group with df=%d "
                "> max_shingle_df=%d (%d pairs skipped; reported "
                "jaccard values are now lower bounds for affected docs)",
                m, max_shingle_df, m * (m - 1) // 2)
            return pair_schema.empty_table()
        order = pc.sort_indices(grp.column("id"))
        ids = grp.column("id").take(order).combine_chunks()
        ns = grp.column("n").take(order).combine_chunks()
        # chunked upper-triangle emission: rows [i0, i1) of the triangle
        # per chunk, each bounded to ~chunk_pairs index entries, so a
        # raised cap cannot make one giant (m^2/2)-sized temp
        CHUNK_PAIRS = chunk_pairs
        parts, i0 = [], 0
        while i0 < m - 1:
            i1, budget = i0, CHUNK_PAIRS
            while i1 < m - 1 and budget > 0:
                budget -= m - 1 - i1
                i1 += 1
            rows = np.arange(i0, i1)
            reps = (m - 1 - rows).astype(np.int64)
            a_idx = np.repeat(rows, reps)
            b_idx = (np.arange(reps.sum(), dtype=np.int64)
                     - np.repeat(np.cumsum(reps) - reps, reps)
                     + a_idx + 1)
            parts.append(pa.table({
                "id_a": ids.take(pa.array(a_idx)),
                "id_b": ids.take(pa.array(b_idx)),
                "n_a": ns.take(pa.array(a_idx)),
                "n_b": ns.take(pa.array(b_idx))}))
            i0 = i1
        return pa.concat_tables(parts).cast(pair_schema)

    pairs = shingles.groupby("shingle").map_groups(
        emit_pairs, batch_format="pyarrow")

    def key_pairs(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pair_schema.append(pa.field("pair", pa.string())
                                      ).empty_table()
        ka = [f"{a}\x00{b}" for a, b in zip(tbl.column("id_a").to_pylist(),
                                            tbl.column("id_b").to_pylist())]
        return tbl.append_column("pair", pa.array(ka, pa.string()))

    def count_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return counted_schema.empty_table()
        return pa.table(
            {"id_a": g.column("id_a").slice(0, 1),
             "id_b": g.column("id_b").slice(0, 1),
             "n_common": pa.array([g.num_rows], pa.int64()),
             "n_a": g.column("n_a").slice(0, 1),
             "n_b": g.column("n_b").slice(0, 1)})

    counted = (
        pairs.map_batches(key_pairs, batch_format="pyarrow")
        .groupby("pair")
        .map_groups(count_group, batch_format="pyarrow")
    )

    def finish(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:  # empty shuffle partitions are schema-less
            return out_schema.empty_table()
        inter = tbl.column("n_common").to_numpy().astype(np.float64)
        na = tbl.column("n_a").to_numpy().astype(np.float64)
        nb = tbl.column("n_b").to_numpy().astype(np.float64)
        j = inter / (na + nb - inter)
        out = pa.table(
            {
                "id_a": tbl.column("id_a"),
                "id_b": tbl.column("id_b"),
                "n_common": tbl.column("n_common"),
                "n_a": pa.array(na.astype(np.int64)),
                "n_b": pa.array(nb.astype(np.int64)),
                "jaccard_1e6": pa.array(_scaled(j)),
            }
        )
        return out.filter(pa.array(j >= threshold))

    return counted.map_batches(finish, batch_format="pyarrow").map_batches(
        _pin(out_schema), batch_format="pyarrow")


# ------------------------------------------------------------- MinHash


def _minhash_sigs(sh_hashes: np.ndarray, offsets: np.ndarray, num_perm: int,
                  seed: int) -> np.ndarray:
    """(ndocs, num_perm) uint64 MinHash signatures from flattened
    shingle hashes; empty docs get all-max signatures."""
    ndocs = len(offsets) - 1
    salts = splitmix64(np.arange(1, num_perm + 1, dtype=_U64) +
                       _U64(seed) * _U64(0x9E37_79B9))
    sigs = np.full((ndocs, num_perm), np.iinfo(np.uint64).max, dtype=_U64)
    if len(sh_hashes) == 0:
        return sigs
    nz = np.flatnonzero(np.diff(offsets) > 0)
    starts = offsets[:-1][nz]
    for j in range(num_perm):
        with np.errstate(over="ignore"):
            hv = splitmix64(sh_hashes ^ salts[j])
        sigs[nz, j] = np.minimum.reduceat(hv, starts)
    return sigs


def _minhash_band_buckets(tbl: pa.Table, id_column: str, text_column: str,
                          shingle_size: int, num_perm: int, bands: int,
                          seed: int, include_sig: bool) -> pa.Table:
    """Per-batch: tokenize -> shingle hashes -> minhash sigs -> band
    bucket rows. ``include_sig=False`` (the shuffle stage) emits ONLY
    (bucket, id); ``include_sig=True`` (the candidate-verify stage,
    one row per doc, no band replication) emits (id, sig)."""
    texts = tbl.column(text_column)
    flat, parent, nonempty = _tokens(texts)
    n = tbl.num_rows
    counts = _seg_count(parent, nonempty, n)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    th = hash_strings(flat, seed=seed)[nonempty] if parent.size else \
        np.empty(0, dtype=_U64)
    wh, woff = window_hashes(th, offsets, shingle_size)
    sigs = _minhash_sigs(wh, woff, num_perm, seed)
    ids = tbl.column(id_column)
    if include_sig:
        return pa.table({
            "id": ids,
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.view(np.int64).ravel()), num_perm),
        })
    # shingle-less docs (empty / whitespace-only text — e.g. html-only
    # rows) all share the all-max signature: at web scale they form
    # one giant degenerate bucket (observed: 149,670 members = the 5%
    # empty-text rows of a 3M corpus) that the bucket cap then drops
    # with a warning. They cannot be MEANINGFUL near-dup candidates,
    # so they emit no LSH rows at all; exact empty-text duplicates
    # remain findable via exact_duplicates.
    has_shingles = np.diff(woff) > 0
    if not has_shingles.all():
        keep_idx = np.flatnonzero(has_shingles)
        ids = ids.take(pa.array(keep_idx))
        sigs = sigs[keep_idx]
        n = len(keep_idx)
    rows_per_band = num_perm // bands
    band_sigs = sigs.reshape(n, bands, rows_per_band)
    out_bucket = np.empty(n * bands, dtype=_U64)
    for b in range(bands):
        acc = combine_hashes(
            np.full(n, b + 1, dtype=_U64),
            *[band_sigs[:, b, r] for r in range(rows_per_band)],
        )
        out_bucket[b::bands] = acc
    rep_ids = ids.take(pa.array(np.repeat(np.arange(n), bands)))
    return pa.table({
        "bucket": pa.array(out_bucket.view(np.int64)),
        "id": rep_ids,
    })


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    shingle_size: int = 3,
    num_perm: int = 128,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int = 2000,
    seed: int = 17,
    max_candidate_ids: int = 5_000_000,
) -> ray.data.Dataset:
    """MinHash+LSH near-duplicate pairs.

    Returns (id_a, id_b, est_jaccard_1e6): pairs sharing at least one
    LSH band bucket whose signature agreement >= threshold. Buckets
    larger than ``max_bucket`` are skipped with a WARNING (head-bucket
    cap).

    100-TB dataflow: the bucket shuffle moves ONLY (bucket, id) rows —
    ~24 B x bands per doc, NOT the num_perm x 8 B signature replicated
    per band (the naive layout ships ~16 KB/doc at the defaults and
    was measured unrunnable at 3M docs). Verification then recomputes
    signatures ONCE per CANDIDATE id (near-dup candidates are a small
    fraction of the corpus): candidate ids are broadcast via
    ``ray.put`` to filter the corpus, and the (id, sig) rows meet the
    pair rows through two groupbys — no joins, nothing driver-side
    beyond the candidate-id array (capped at ``max_candidate_ids``,
    raising rather than silently collecting an unbounded set).
    """
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")

    sig_kwargs = dict(id_column=id_column, text_column=text_column,
                      shingle_size=shingle_size, num_perm=num_perm,
                      bands=bands, seed=seed)

    buckets = ds.map_batches(
        lambda t: _minhash_band_buckets(t, include_sig=False, **sig_kwargs),
        batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(grp: pa.Table) -> pa.Table:
        m = grp.num_rows
        id_type = grp.column("id").type
        empty = pa.table({"id_a": pa.array([], id_type),
                          "id_b": pa.array([], id_type)})
        if m < 2:
            return empty
        if m > max_bucket:
            _LOG.warning(
                "minhash_lsh_pairs: dropping LSH bucket with %d members "
                "> max_bucket=%d (candidate recall reduced)", m, max_bucket)
            return empty
        order = pc.sort_indices(grp.column("id"))
        ids = grp.column("id").take(order).combine_chunks()
        # drop same-id repeats (a doc can collide via >1 band)
        if m > 1:
            idv = np.asarray(ids.to_numpy(zero_copy_only=False))
            first = np.concatenate([[True], idv[1:] != idv[:-1]])
            ids = ids.filter(pa.array(first))
            m = len(ids)
        if m < 2:
            return empty
        a_idx, b_idx = np.triu_indices(m, 1)
        return pa.table({"id_a": ids.take(pa.array(a_idx)),
                         "id_b": ids.take(pa.array(b_idx))})

    pairs = buckets.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pyarrow")

    def key_pairs(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.string()),
                             "id_b": pa.array([], pa.string()),
                             "pair": pa.array([], pa.string())})
        k = [f"{a}\x00{b}" for a, b in zip(tbl.column("id_a").to_pylist(),
                                           tbl.column("id_b").to_pylist())]
        return tbl.append_column("pair", pa.array(k, pa.string()))

    cand = (
        pairs.map_batches(key_pairs, batch_format="pyarrow")
        .groupby("pair")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .materialize()
    )

    # ---- verification: recompute sigs for candidate ids only ----
    cand_ids: set = set()
    for b in cand.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        cand_ids.update(b.column("id_a").to_pylist())
        cand_ids.update(b.column("id_b").to_pylist())
        if len(cand_ids) > max_candidate_ids:
            raise ValueError(
                f"minhash_lsh_pairs: > {max_candidate_ids} distinct "
                "candidate ids; raise max_candidate_ids or pre-shard "
                "the corpus (per-language / per-snapshot) before LSH")
    from .windows import _field_type

    idt = _field_type(ds, id_column)
    est_schema = pa.schema([("id_a", idt), ("id_b", idt),
                            ("est_jaccard_1e6", pa.int64())])
    if not cand_ids:
        return ray.data.from_arrow(est_schema.empty_table())
    id_ref = ray.put(np.sort(np.array(list(cand_ids), dtype=object)))

    def sig_for_candidates(tbl: pa.Table) -> pa.Table:
        wanted = ray.get(id_ref)
        idv = np.asarray(
            tbl.column(id_column).to_numpy(zero_copy_only=False))
        pos = np.searchsorted(wanted, idv)
        pos = np.minimum(pos, len(wanted) - 1)
        mask = wanted[pos] == idv
        sub = tbl.filter(pa.array(mask))
        if sub.num_rows == 0:
            return pa.table({
                "id": pa.array([], tbl.column(id_column).type),
                "sig": pa.array([], pa.list_(pa.int64()))})
        out = _minhash_band_buckets(sub, include_sig=True, **sig_kwargs)
        return pa.table({"id": out.column("id"),
                         "sig": out.column("sig").cast(
                             pa.list_(pa.int64()))})

    sig_rows = ds.map_batches(sig_for_candidates, batch_format="pyarrow",
                              zero_copy_batch=True)

    # meet pair rows and sig rows via groupby over a STRING key (the
    # two unioned datasets must agree on the key type); typed id_a /
    # id_b ride along as payload so the output keeps the input id type
    row_schema = pa.schema([
        ("key", pa.string()), ("pair", pa.string()),
        ("id_a", idt), ("id_b", idt), ("sig", pa.list_(pa.int64())),
    ])

    def pair_sides(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return row_schema.empty_table()
        parts = []
        for side in ("id_a", "id_b"):
            parts.append(pa.table({
                "key": pc.cast(tbl.column(side), pa.string()),
                "pair": tbl.column("pair"),
                "id_a": tbl.column("id_a"),
                "id_b": tbl.column("id_b"),
                "sig": pa.array([None] * tbl.num_rows,
                                pa.list_(pa.int64())),
            }, schema=row_schema))
        return pa.concat_tables(parts)

    def tag_sigs(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return row_schema.empty_table()
        return pa.table({
            "key": pc.cast(tbl.column("id"), pa.string()),
            "pair": pa.array([None] * tbl.num_rows, pa.string()),
            "id_a": pa.array([None] * tbl.num_rows, idt),
            "id_b": pa.array([None] * tbl.num_rows, idt),
            "sig": tbl.column("sig"),
        }, schema=row_schema)

    sides = cand.map_batches(pair_sides, batch_format="pyarrow")
    tagged = sig_rows.map_batches(tag_sigs, batch_format="pyarrow")

    def attach(grp: pa.Table) -> pa.Table:
        sig_mask = pc.is_valid(grp.column("sig"))
        sig_rows_ = grp.filter(sig_mask)
        pair_rows = grp.filter(pc.invert(sig_mask))
        if sig_rows_.num_rows == 0 or pair_rows.num_rows == 0:
            return row_schema.empty_table()
        n = pair_rows.num_rows
        sig = sig_rows_.column("sig").slice(0, 1).take(
            pa.array(np.zeros(n, dtype=np.int64)))
        return pa.table({
            "key": pair_rows.column("key"),
            "pair": pair_rows.column("pair"),
            "id_a": pair_rows.column("id_a"),
            "id_b": pair_rows.column("id_b"),
            "sig": sig,
        }, schema=row_schema)

    def verify(grp: pa.Table) -> pa.Table:
        if grp.num_rows != 2:  # a side lost its sig (id absent): drop
            return est_schema.empty_table()
        s = grp.column("sig").combine_chunks()
        a = np.asarray(s[0].as_py(), dtype=np.int64)
        b = np.asarray(s[1].as_py(), dtype=np.int64)
        agree = float((a == b).mean())
        if agree < threshold:
            return est_schema.empty_table()
        return pa.table({
            "id_a": grp.column("id_a").slice(0, 1),
            "id_b": grp.column("id_b").slice(0, 1),
            "est_jaccard_1e6": pa.array(
                [int(np.floor(agree * 1e6 + 0.5))], pa.int64()),
        }, schema=est_schema)

    return (
        sides.union(tagged)
        .groupby("key").map_groups(attach, batch_format="pyarrow")
        .groupby("pair").map_groups(verify, batch_format="pyarrow")
    )


# ------------------------------------------------------------- SimHash


def simhash_pairs(
    ds: ray.data.Dataset,
    *,
    id_column: str = "doc_id",
    text_column: str = "text",
    max_hamming: int = 3,
    max_bucket: int = 2000,
    seed: int = 23,
) -> ray.data.Dataset:
    """64-bit SimHash near-duplicate pairs.

    Bands the fingerprint into 4x16 bits (any pair within Hamming
    distance 3 shares at least one exact band); candidates sharing a
    band are verified exactly -> (id_a, id_b, hamming).
    """

    def sim_stage(tbl: pa.Table) -> pa.Table:
        texts = tbl.column(text_column)
        flat, parent, nonempty = _tokens(texts)
        n = tbl.num_rows
        counts = _seg_count(parent, nonempty, n)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        th = hash_strings(flat, seed=seed)[nonempty] if parent.size else \
            np.empty(0, dtype=_U64)
        # sign(sum over tokens of +-1 per bit) == (2 * ones-count >
        # token-count), so 64 per-bit reduceat passes suffice — the
        # (tokens x 64) +-1 matrix of the naive layout costs ~0.5 GB
        # per 8k-doc batch at web text lengths and thrashed at 3M docs
        doc_len = np.diff(offsets)
        nz = np.flatnonzero(doc_len > 0)
        sim = np.zeros(n, dtype=_U64)
        if th.size and nz.size:
            starts = offsets[:-1][nz]
            len_nz = doc_len[nz]
            for b in range(64):
                bit = ((th >> _U64(b)) & _U64(1)).astype(np.int64)
                cnt = np.add.reduceat(bit, starts)
                sim[nz] |= (2 * cnt > len_nz).astype(_U64) << _U64(b)
        ids = tbl.column(id_column)
        # token-less docs all share simhash 0: skip them (same
        # degenerate-bucket rationale as minhash — see
        # _minhash_band_buckets)
        has_tokens = np.diff(offsets) > 0
        if not has_tokens.all():
            keep_idx = np.flatnonzero(has_tokens)
            ids = ids.take(pa.array(keep_idx))
            sim = sim[keep_idx]
            n = len(keep_idx)
        bandvals = sim.view(np.uint16).reshape(n, 4)
        bucket = np.empty(n * 4, dtype=_U64)
        for b in range(4):
            bucket[b::4] = combine_hashes(
                np.full(n, b + 101, dtype=_U64),
                bandvals[:, b].astype(_U64),
            )
        rep = pa.array(np.repeat(np.arange(n), 4))
        return pa.table(
            {
                "bucket": pa.array(bucket.view(np.int64)),
                "id": ids.take(rep),
                "simhash": pa.array(np.repeat(sim.view(np.int64), 4)),
            }
        )

    buckets = ds.map_batches(
        sim_stage, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(grp: pa.Table) -> pa.Table:
        m = grp.num_rows
        id_type = grp.column("id").type
        empty = pa.table({"id_a": pa.array([], id_type),
                          "id_b": pa.array([], id_type),
                          "hamming": pa.array([], pa.int64())})
        if m < 2:
            return empty
        if m > max_bucket:
            _LOG.warning(
                "simhash_pairs: dropping band bucket with %d members "
                "> max_bucket=%d (candidate recall reduced)", m, max_bucket)
            return empty
        ids = grp.column("id").to_pylist()
        sims = grp.column("simhash").to_numpy().view(_U64)
        order = sorted(range(m), key=lambda i: ids[i])
        ids = [ids[i] for i in order]
        sims = sims[np.array(order)]
        keep = [i for i in range(m) if i == 0 or ids[i] != ids[i - 1]]
        ids = [ids[i] for i in keep]
        sims = sims[keep]
        m = len(ids)
        if m < 2:
            return empty
        out_a, out_b, out_h = [], [], []
        for i in range(m - 1):
            ham = popcount64(sims[i + 1:] ^ sims[i])
            hit = np.flatnonzero(ham <= max_hamming)
            for h in hit:
                out_a.append(ids[i])
                out_b.append(ids[i + 1 + h])
                out_h.append(int(ham[h]))
        return pa.table({"id_a": pa.array(out_a, id_type),
                         "id_b": pa.array(out_b, id_type),
                         "hamming": pa.array(out_h, pa.int64())})

    pairs = buckets.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pyarrow")

    def key_pairs(tbl: pa.Table) -> pa.Table:
        k = [f"{a}\x00{b}" for a, b in zip(tbl.column("id_a").to_pylist(),
                                           tbl.column("id_b").to_pylist())]
        return tbl.append_column("pair", pa.array(k, pa.string()))

    return (
        pairs.map_batches(key_pairs, batch_format="pyarrow")
        .groupby("pair")
        .map_groups(lambda g: g.select(
            ["id_a", "id_b", "hamming"]).slice(0, 1), batch_format="pyarrow")
    )
