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


# number of coarse hash partitions used to make pair-level reductions
# (distinct / count) vectorized: groups are PARTITIONS, not pairs, so
# map_groups pays one Python call per partition, never per pair
_DISTINCT_PARTS = 256


def _hash_part(col: pa.ChunkedArray | pa.Array, num_partitions: int,
               seed: int) -> pa.Array:
    """Vectorized int64 partition id for an arbitrary-typed column."""
    key = pc.cast(col, pa.string())
    if isinstance(key, pa.ChunkedArray):
        key = key.combine_chunks()
    part = hash_strings(key, seed=seed) % _U64(num_partitions)
    return pa.array(part.astype(np.int64))


def _pair_part(tbl: pa.Table, num_partitions: int, seed: int) -> pa.Array:
    """Vectorized partition id over the (id_a, id_b) pair — replaces
    the per-row Python f-string pair keys of earlier revisions."""
    parts = []
    for c in ("id_a", "id_b"):
        key = pc.cast(tbl.column(c), pa.string())
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        parts.append(hash_strings(key, seed=seed))
    pk = combine_hashes(*parts)
    return pa.array((pk % _U64(num_partitions)).astype(np.int64))


def _run_starts(tbl: pa.Table, columns: tuple[str, ...]) -> np.ndarray:
    """Boolean first-in-run mask over a table already SORTED by
    ``columns`` (vectorized neighbor comparison, exact for any type)."""
    n = tbl.num_rows
    first = np.ones(n, dtype=bool)
    if n > 1:
        same = None
        for c in columns:
            col = tbl.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            eq = pc.equal(col.slice(1), col.slice(0, n - 1))
            same = eq if same is None else pc.and_(same, eq)
        first[1:] = ~same.to_numpy(zero_copy_only=False)
    return first


def _distinct_pairs(pairs: ray.data.Dataset, schema: pa.Schema,
                    *, num_partitions: int = _DISTINCT_PARTS
                    ) -> ray.data.Dataset:
    """Globally distinct (id_a, id_b[, payload...]) rows with NO
    per-pair Python: coarse hash-partition on the pair, then one
    vectorized sort + neighbor-dedup per partition. Payload columns
    (which must be identical across duplicates of a pair, e.g. the
    hamming distance) keep the first row of each run."""
    part_schema = schema.append(pa.field("part", pa.int64()))

    def add_part(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return part_schema.empty_table()
        return tbl.select(schema.names).append_column(
            "part", _pair_part(tbl, num_partitions, seed=7))

    def distinct(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return schema.empty_table()
        order = pc.sort_indices(grp, sort_keys=[
            ("id_a", "ascending"), ("id_b", "ascending")])
        t = grp.take(order).combine_chunks()
        first = _run_starts(t, ("id_a", "id_b"))
        if not first.all():
            t = t.filter(pa.array(first))
        return t.select(schema.names)

    return (pairs.map_batches(add_part, batch_format="pyarrow")
            .groupby("part").map_groups(distinct, batch_format="pyarrow"))


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
        th = _hash128_hex(tbl.column(text_column))
        return pa.table(
            {"text_hash": th, "id": tbl.column(id_column),
             "part": _hash_part(th, _DISTINCT_PARTS, seed=9)}
        )

    def emit(grp: pa.Table) -> pa.Table:
        # one COARSE hash partition (not one duplicate group): sort by
        # (hash, id) and emit (run-min, member) edges per run,
        # vectorized — one Python call per partition, never per group
        n = grp.num_rows
        id_type = grp.column("id").type
        empty = pa.table({"id_a": pa.array([], id_type),
                          "id_b": pa.array([], id_type)})
        if n < 2:
            return empty
        order = pc.sort_indices(grp, sort_keys=[
            ("text_hash", "ascending"), ("id", "ascending")])
        t = grp.take(order).combine_chunks()
        first = _run_starts(t, ("text_hash",))
        start_pos = np.flatnonzero(first)
        runlens = np.diff(np.append(start_pos, n))
        a_take = np.repeat(start_pos, runlens - 1)
        if a_take.size == 0:
            return empty
        b_take = np.flatnonzero(~first)
        ids = t.column("id")
        return pa.table({"id_a": ids.take(pa.array(a_take)),
                         "id_b": ids.take(pa.array(b_take))})

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
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
    max_shingle_df: int = 100_000,
) -> ray.data.Dataset:
    """Exact n-gram-Jaccard near-duplicate pairs.

    Returns (id_a, id_b, n_common, n_a, n_b, jaccard_1e6) for pairs
    with Jaccard >= threshold over distinct ``shingle_size``-token
    shingles (docs shorter than the shingle size contribute their whole
    token sequence as one shingle). Shingles with document frequency >
    ``max_shingle_df`` are excluded from pair GENERATION (a last-resort
    quadratic-head guard) but still count toward per-doc sizes, so a
    computed Jaccard becomes a lower bound IF a drop happened; every
    dropped shingle group is logged as a WARNING with its df. The
    default cap (100k) is deliberately high enough that natural-language
    3-gram shingles essentially never hit it — results stay EXACT by
    default, as the function's name promises; memory safety comes from
    chunked emission instead: groups emit their pair rows in bounded
    sub-chunks so peak task memory stays ~O(chunk), not O(df^2). A df
    at the cap emits ~5e9 pair rows — slow but streamed; corpora with
    heads that hot should use :func:`minhash_lsh_pairs` (this function
    is the exact oracle baseline for BOUNDED corpora; it is inherently
    O(sum df^2) and was measured OutOfDisk at 3M web docs).

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

    def add_part(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pair_schema.append(pa.field("part", pa.int64())
                                      ).empty_table()
        return tbl.append_column(
            "part", _pair_part(tbl, _DISTINCT_PARTS, seed=7))

    def count_runs(grp: pa.Table) -> pa.Table:
        # one COARSE hash partition: sort by the pair and run-length
        # count co-occurrences, all vectorized — one Python call per
        # partition, never per pair
        n = grp.num_rows
        if n == 0:
            return counted_schema.empty_table()
        order = pc.sort_indices(grp, sort_keys=[
            ("id_a", "ascending"), ("id_b", "ascending")])
        t = grp.take(order).combine_chunks()
        first = _run_starts(t, ("id_a", "id_b"))
        starts = np.flatnonzero(first)
        runlens = np.diff(np.append(starts, n))
        take = pa.array(starts)
        return pa.table({
            "id_a": t.column("id_a").take(take),
            "id_b": t.column("id_b").take(take),
            "n_common": pa.array(runlens.astype(np.int64)),
            "n_a": t.column("n_a").take(take),
            "n_b": t.column("n_b").take(take),
        }, schema=counted_schema)

    counted = (
        pairs.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(count_runs, batch_format="pyarrow")
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
    broadcast_max_ids: int = 5_000_000,
    semi_join_partitions: int | None = None,
    target_group_rows: int = 65_536,
    sig_broadcast_max_bytes: int = 256 << 20,
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
    fraction of the corpus). Every per-pair step is vectorized —
    there is no per-pair Python anywhere — and every small-side step
    is SCALE-ADAPTIVE with a distributed fallback:

    - candidate-pair dedup: coarse hash partitions, one vectorized
      sort + neighbor pass per partition;
    - candidate ids: driver ``pc.unique`` over the bounded pair set
      when ``2*n_pairs <= broadcast_max_ids``, else a distributed
      coarse-partition unique;
    - id -> corpus: ids broadcast ONCE via ``ray.put`` and probed per
      batch when ``<= broadcast_max_ids`` (no corpus shuffle), else a
      hash-partitioned ``left_semi`` join (``semi_join_partitions``
      way) — NO driver-memory ceiling, dup-heavy corpora degrade to
      one extra corpus shuffle, never a failure;
    - verify: when the candidate sig matrix fits
      ``sig_broadcast_max_bytes`` (256 MB ~= 250k candidate ids at
      the defaults) it is broadcast and every pair verified in ONE
      vectorized map over the pair set (zero extra shuffles); above
      that, two coarse-partitioned groupbys attach sigs to pair sides
      (``pc.index_in``) and compare stacked signature matrices with
      one numpy equality reduction per partition
      (``target_group_rows`` sig rows per task).
    """
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")

    sig_kwargs = dict(id_column=id_column, text_column=text_column,
                      shingle_size=shingle_size, num_perm=num_perm,
                      bands=bands, seed=seed)

    buckets = ds.map_batches(
        lambda t: _minhash_band_buckets(t, include_sig=False, **sig_kwargs),
        batch_format="pyarrow", zero_copy_batch=True)

    # ---- candidate pairs: coarse-partition vectorized triangles ----
    # nearly every bucket is a singleton (measured: 7.6M band rows ->
    # 7.6M distinct buckets on a 500k-doc no-dup corpus), so a
    # groupby("bucket").map_groups pays one Python call per BUCKET —
    # millions of interpreter slices for nothing. Partition by
    # hash(bucket) % P instead and emit every bucket's upper triangle
    # in ONE vectorized pass per partition (measured 2.2x end-to-end
    # at 500k docs: 48.9 s -> 22.4 s, now minhash-compute bound).
    from .windows import _field_type

    id_type = _field_type(ds, id_column)
    bpair_schema = pa.schema([("id_a", id_type), ("id_b", id_type)])

    def add_bpart(tbl: pa.Table) -> pa.Table:
        bk = tbl.column("bucket").to_numpy().view(_U64)
        return tbl.append_column("bpart", pa.array(
            (bk % _U64(_DISTINCT_PARTS)).astype(np.int64)))

    def bucket_pairs_part(grp: pa.Table) -> pa.Table:
        if grp.num_rows < 2:
            return bpair_schema.empty_table()
        order = pc.sort_indices(grp, sort_keys=[
            ("bucket", "ascending"), ("id", "ascending")])
        t = grp.take(order).combine_chunks()
        bk = t.column("bucket").to_numpy()
        idv = np.asarray(t.column("id").to_numpy(zero_copy_only=False))
        n = len(bk)
        new_b = np.empty(n, dtype=bool)
        new_b[0] = True
        new_b[1:] = bk[1:] != bk[:-1]
        # head-bucket cap on RAW band rows (pre-dedup), matching the
        # per-bucket implementation's semantics
        starts = np.flatnonzero(new_b)
        sizes = np.diff(np.append(starts, n))
        big = sizes > max_bucket
        if big.any():
            _LOG.warning(
                "minhash_lsh_pairs: dropping %d LSH bucket(s) with up "
                "to %d members > max_bucket=%d (candidate recall "
                "reduced)", int(big.sum()), int(sizes.max()), max_bucket)
            drop = np.repeat(big, sizes)
            keep = ~drop
            bk, idv, new_b = bk[keep], idv[keep], None
            ids_arr = t.column("id").filter(pa.array(keep))
            n = len(bk)
            if n < 2:
                return bpair_schema.empty_table()
            new_b = np.empty(n, dtype=bool)
            new_b[0] = True
            new_b[1:] = bk[1:] != bk[:-1]
        else:
            ids_arr = t.column("id")
        # drop same-(bucket, id) repeats (a doc can collide via >1 band)
        first = new_b.copy()
        first[1:] |= idv[1:] != idv[:-1]
        if not first.all():
            ids_arr = ids_arr.filter(pa.array(first))
            bk = bk[first]
            n = len(bk)
            new_b = np.empty(n, dtype=bool)
            new_b[0] = True
            new_b[1:] = bk[1:] != bk[:-1]
        # per-row pair fanout: row at local index i of a size-s bucket
        # pairs with the s-1-i rows after it
        starts = np.flatnonzero(new_b)
        sizes = np.diff(np.append(starts, n))
        local = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
        reps = np.repeat(sizes, sizes) - 1 - local
        total = int(reps.sum())
        if total == 0:
            return bpair_schema.empty_table()
        a_idx = np.repeat(np.arange(n, dtype=np.int64), reps)
        b_idx = (np.arange(total, dtype=np.int64)
                 - np.repeat(np.cumsum(reps) - reps, reps) + a_idx + 1)
        return pa.table({"id_a": ids_arr.take(pa.array(a_idx)),
                         "id_b": ids_arr.take(pa.array(b_idx))},
                        schema=bpair_schema)

    pairs = buckets.map_batches(
        add_bpart, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("bpart").map_groups(bucket_pairs_part,
                                  batch_format="pyarrow")

    from .windows import _field_type, _pin

    idt = _field_type(ds, id_column)
    est_schema = pa.schema([("id_a", idt), ("id_b", idt),
                            ("est_jaccard_1e6", pa.int64())])
    pair_schema = pa.schema([("id_a", idt), ("id_b", idt)])

    # distinct candidate pairs (a doc pair can collide via several
    # bands) — coarse-partition vectorized dedup, one Python call per
    # partition. Materialized once: it is re-read for the id side and
    # the pair side below, and its count sizes the verify partitions.
    cand = _distinct_pairs(pairs, pair_schema).materialize()
    n_pairs = cand.count()
    if n_pairs == 0:
        return ray.data.from_arrow(est_schema.empty_table())

    # ---- distinct candidate ids ----
    # 2*n_pairs bounds the distinct-id count, so when that fits under
    # broadcast_max_ids the distinct ids come from ONE driver-side
    # pc.unique over the (already materialized, bounded) pair set — no
    # extra shuffle round. Above the bound, a distributed
    # coarse-partition unique runs instead (no driver ceiling).
    wanted: pa.Array | None = None
    cand_ids: ray.data.Dataset | None = None
    if 2 * n_pairs <= broadcast_max_ids:
        wanted = pc.unique(pa.concat_arrays(
            [b.column(c).combine_chunks()
             for b in cand.iter_batches(batch_format="pyarrow")
             if b.num_rows
             for c in ("id_a", "id_b")]))
        n_ids = len(wanted)
    else:
        def both_sides(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0:
                return pa.table({"cid": pa.array([], idt),
                                 "part": pa.array([], pa.int64())})
            cid = pa.concat_arrays([
                tbl.column("id_a").combine_chunks(),
                tbl.column("id_b").combine_chunks()])
            return pa.table({
                "cid": cid,
                "part": _hash_part(cid, _DISTINCT_PARTS, seed=11)})

        def uniq(grp: pa.Table) -> pa.Table:
            return pa.table(
                {"cid": grp.column("cid").combine_chunks().unique()})

        cand_ids = (cand.map_batches(both_sides, batch_format="pyarrow")
                    .groupby("part").map_groups(uniq, batch_format="pyarrow")
                    .materialize())
        n_ids = cand_ids.count()

    # ---- recompute sigs for candidate docs only ----
    sig_type = pa.list_(pa.int64(), num_perm)
    sig_schema = pa.schema([("id", idt), ("sig", sig_type)])

    if n_ids <= broadcast_max_ids:
        # small side: broadcast the id array ONCE (ray.put), probe per
        # batch with pyarrow's hash lookup — no corpus shuffle
        if wanted is None:
            wanted = pa.concat_arrays([
                b.column("cid").combine_chunks()
                for b in cand_ids.iter_batches(batch_format="pyarrow")])
        wanted_ref = ray.put(wanted)

        def filter_docs(tbl: pa.Table) -> pa.Table:
            idx = pc.index_in(tbl.column(id_column),
                              value_set=ray.get(wanted_ref))
            return tbl.filter(pc.is_valid(idx))

        cand_docs = ds.map_batches(filter_docs, batch_format="pyarrow",
                                   zero_copy_batch=True)
    else:
        # big side: hash-partitioned semi-join — one corpus shuffle,
        # no driver-memory ceiling
        _LOG.info(
            "minhash_lsh_pairs: %d candidate ids > broadcast_max_ids=%d"
            " — using a hash-partitioned left_semi join",
            n_ids, broadcast_max_ids)
        from ..util import auto_join_partitions

        pinned_ids = cand_ids.rename_columns({"cid": id_column}).map_batches(
            _pin(pa.schema([(id_column, idt)])), batch_format="pyarrow")
        cand_docs = ds.select_columns([id_column, text_column]).join(
            pinned_ids, join_type="left_semi",
            num_partitions=semi_join_partitions or auto_join_partitions(),
            on=(id_column,))

    def compute_sigs(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return sig_schema.empty_table()
        out = _minhash_band_buckets(tbl, include_sig=True, **sig_kwargs)
        return out.cast(sig_schema)

    sig_rows = cand_docs.map_batches(compute_sigs, batch_format="pyarrow")

    if n_ids * num_perm * 8 <= sig_broadcast_max_bytes:
        # ---- bounded small-side verify (the common case: near-dup
        # candidates are a tiny corpus fraction) ----
        # collect the candidate sig matrix once (cap
        # sig_broadcast_max_bytes, default 256 MB), broadcast it, and
        # verify EVERY pair in one vectorized map over the pair set —
        # zero additional shuffle rounds. Above the cap the
        # coarse-partitioned attach/compare below runs instead.
        ids_parts, mats = [], []
        for b in sig_rows.iter_batches(batch_format="pyarrow"):
            if b.num_rows == 0:
                continue
            ids_parts.append(b.column("id").combine_chunks())
            mats.append(b.column("sig").combine_chunks().flatten()
                        .to_numpy(zero_copy_only=False)
                        .reshape(b.num_rows, num_perm))
        if not ids_parts:
            return ray.data.from_arrow(est_schema.empty_table())
        sig_ref = ray.put((pa.concat_arrays(ids_parts), np.vstack(mats)))

        def verify_small(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0:
                return est_schema.empty_table()
            sid, mat = ray.get(sig_ref)
            ia = pc.index_in(tbl.column("id_a"), value_set=sid)
            ib = pc.index_in(tbl.column("id_b"), value_set=sid)
            ok = pc.and_(pc.is_valid(ia), pc.is_valid(ib))
            t = tbl.filter(ok)
            if t.num_rows == 0:
                return est_schema.empty_table()
            iav = ia.filter(ok).to_numpy(zero_copy_only=False)
            ibv = ib.filter(ok).to_numpy(zero_copy_only=False)
            agree = (mat[iav] == mat[ibv]).mean(axis=1)
            keep = agree >= threshold
            t = t.filter(pa.array(keep))
            return pa.table({
                "id_a": t.column("id_a"),
                "id_b": t.column("id_b"),
                "est_jaccard_1e6": pa.array(_scaled(agree[keep])),
            }, schema=est_schema)

        return cand.map_batches(
            verify_small, batch_format="pyarrow"
        ).map_batches(_pin(est_schema), batch_format="pyarrow")

    # ---- vectorized attach + compare over coarse partitions ----
    # partition counts sized so one group holds ~target_group_rows
    # 1 KB sig rows (bounded task memory at any candidate volume)
    p_att = int(np.clip((2 * n_pairs + n_ids) // target_group_rows + 1,
                        1, 4096))
    p_ver = int(np.clip(n_pairs // target_group_rows + 1, 1, 4096))

    row_schema = pa.schema([
        ("part", pa.int64()), ("key", pa.string()), ("side", pa.int8()),
        ("id_a", idt), ("id_b", idt), ("sig", sig_type)])

    def pair_sides(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return row_schema.empty_table()
        out = []
        for side, col in ((0, "id_a"), (1, "id_b")):
            key = pc.cast(tbl.column(col), pa.string()).combine_chunks()
            part = hash_strings(key, seed=13) % _U64(p_att)
            out.append(pa.table({
                "part": pa.array(part.astype(np.int64)),
                "key": key,
                "side": pa.array(
                    np.full(tbl.num_rows, side, dtype=np.int8)),
                "id_a": tbl.column("id_a"),
                "id_b": tbl.column("id_b"),
                "sig": pa.nulls(tbl.num_rows, sig_type),
            }, schema=row_schema))
        return pa.concat_tables(out)

    def tag_sigs(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return row_schema.empty_table()
        key = pc.cast(tbl.column("id"), pa.string()).combine_chunks()
        part = hash_strings(key, seed=13) % _U64(p_att)
        return pa.table({
            "part": pa.array(part.astype(np.int64)),
            "key": key,
            "side": pa.array(np.full(tbl.num_rows, -1, dtype=np.int8)),
            "id_a": pa.nulls(tbl.num_rows, idt),
            "id_b": pa.nulls(tbl.num_rows, idt),
            "sig": tbl.column("sig"),
        }, schema=row_schema)

    sides = cand.map_batches(pair_sides, batch_format="pyarrow")
    tagged = sig_rows.map_batches(tag_sigs, batch_format="pyarrow")

    att_schema = pa.schema([
        ("vpart", pa.int64()), ("side", pa.int8()),
        ("id_a", idt), ("id_b", idt), ("sig", sig_type)])

    def attach_vec(grp: pa.Table) -> pa.Table:
        # one coarse key partition: look every pair-side's id up in
        # the partition's sig rows with ONE pc.index_in (pairs whose
        # id has no sig — shingle-less doc — drop here, matching the
        # previous per-pair semantics)
        sig_mask = pc.is_valid(grp.column("sig"))
        sig_t = grp.filter(sig_mask)
        side_t = grp.filter(pc.invert(sig_mask))
        if sig_t.num_rows == 0 or side_t.num_rows == 0:
            return att_schema.empty_table()
        idx = pc.index_in(side_t.column("key"),
                          value_set=sig_t.column("key").combine_chunks())
        ok = pc.is_valid(idx)
        side_t = side_t.filter(ok)
        if side_t.num_rows == 0:
            return att_schema.empty_table()
        sig = sig_t.column("sig").combine_chunks().take(idx.filter(ok))
        vpart = combine_hashes(
            hash_strings(pc.cast(side_t.column("id_a"),
                                 pa.string()).combine_chunks(), seed=19),
            hash_strings(pc.cast(side_t.column("id_b"),
                                 pa.string()).combine_chunks(), seed=19),
        ) % _U64(p_ver)
        return pa.table({
            "vpart": pa.array(vpart.astype(np.int64)),
            "side": side_t.column("side"),
            "id_a": side_t.column("id_a"),
            "id_b": side_t.column("id_b"),
            "sig": sig,
        }, schema=att_schema)

    def compare_vec(grp: pa.Table) -> pa.Table:
        # one coarse pair partition: sort by (pair, side) so a pair's
        # two sides are adjacent, then ONE numpy equality reduction
        # over the stacked signature matrix
        n = grp.num_rows
        if n < 2:
            return est_schema.empty_table()
        order = pc.sort_indices(grp, sort_keys=[
            ("id_a", "ascending"), ("id_b", "ascending"),
            ("side", "ascending")])
        t = grp.take(order).combine_chunks()
        first = _run_starts(t, ("id_a", "id_b"))
        sd = t.column("side").to_numpy(zero_copy_only=False)
        match = (~first[1:]) & (sd[:-1] == 0) & (sd[1:] == 1)
        li = np.flatnonzero(match)
        if li.size == 0:
            return est_schema.empty_table()
        mat = (t.column("sig").combine_chunks().flatten()
               .to_numpy(zero_copy_only=False).reshape(n, num_perm))
        agree = (mat[li] == mat[li + 1]).mean(axis=1)
        keep = agree >= threshold
        take = pa.array(li[keep])
        return pa.table({
            "id_a": t.column("id_a").take(take),
            "id_b": t.column("id_b").take(take),
            "est_jaccard_1e6": pa.array(_scaled(agree[keep])),
        }, schema=est_schema)

    return (
        sides.union(tagged)
        .groupby("part").map_groups(attach_vec, batch_format="pyarrow")
        .groupby("vpart").map_groups(compare_vec, batch_format="pyarrow")
        .map_batches(_pin(est_schema), batch_format="pyarrow")
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
        # fully vectorized: arrow sort + neighbor dedup, then ONE
        # triangle popcount over the bucket (m <= max_bucket bounds
        # the m^2/2 temp to ~2M entries at the default cap)
        order = pc.sort_indices(grp.column("id"))
        ids = grp.column("id").take(order).combine_chunks()
        sims = (grp.column("simhash").take(order).combine_chunks()
                .to_numpy().view(_U64))
        eq = pc.equal(ids.slice(1), ids.slice(0, m - 1))
        keep = np.concatenate([[True], ~eq.to_numpy(zero_copy_only=False)])
        if not keep.all():
            ids = ids.filter(pa.array(keep))
            sims = sims[keep]
            m = len(ids)
        if m < 2:
            return empty
        a_idx, b_idx = np.triu_indices(m, 1)
        ham = popcount64(sims[a_idx] ^ sims[b_idx])
        hit = ham <= max_hamming
        return pa.table({"id_a": ids.take(pa.array(a_idx[hit])),
                         "id_b": ids.take(pa.array(b_idx[hit])),
                         "hamming": pa.array(ham[hit])})

    pairs = buckets.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pyarrow")

    from .windows import _field_type

    pair_schema = pa.schema([
        ("id_a", _field_type(ds, id_column)),
        ("id_b", _field_type(ds, id_column)),
        ("hamming", pa.int64())])
    # the hamming payload is identical for every duplicate of a pair,
    # so the coarse-partition vectorized distinct keeps it exactly
    return _distinct_pairs(pairs, pair_schema)
