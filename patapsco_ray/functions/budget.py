"""Token-budget selection and importance sampling for corpus curation.

Two standard dataset-assembly primitives the reference has no analogue
for (its pipelines stop at retrieval; SURVEY.md §2.5):

- :func:`select_by_token_budget` — pick the highest-priority documents
  whose RUNNING token total stays within a budget: the "give me the
  best 50B tokens" cut every training-data mix ends with.  Semantics
  are exactly the SQL window form the oracle runs::

      SELECT ... QUALIFY sum(n_tokens)
        OVER (ORDER BY priority DESC, id ASC) <= budget

  (the running total is monotone, so the selected set is a prefix of
  the (priority DESC, id ASC) total order).

- :func:`importance_sample` — per-row Bernoulli keep with probability
  given by a weight column, decided by a deterministic hash of the row
  key (DoReMi/DSIR-style quality-weighted downsampling).  Like
  ``sample_by_hash``, the decision depends only on (key, seed,
  weight), so re-runs and different cluster shapes select the SAME
  rows, and raising a row's weight strictly grows the sample.

Shape for 100 TB
----------------

``select_by_token_budget`` never sorts the corpus and never ships rows
to the driver:

1. histogram pass — each batch collapses to distinct
   ``(priority, token_sum, doc_count)`` rows (``np.unique`` +
   ``np.add.reduceat``); one tiny ``groupby.sum`` merges them.  Like
   :mod:`.quantiles`, the collected histogram is bounded by the number
   of DISTINCT priorities, not rows — quality scores are discrete or
   quantized in practice (quantize first if yours are continuous).
2. the driver walks the sorted histogram to find the boundary
   priority ``p*``: every doc with priority > ``p*`` is selected
   outright, and a remaining budget ``R`` is left for the ``p*`` tier.
3. boundary refinement — only docs WITH priority == ``p*`` are
   touched again.  If the tier is small (``<= max_boundary_rows``) its
   ``(id, n_tokens)`` rows are folded on the driver; otherwise the
   tier is cut into ``id_bucket_count`` id-range buckets, a second
   tiny histogram finds the boundary BUCKET, and only that bucket
   (~tier/4096 rows) is folded exactly.  A 10^10-doc tier refines
   through a ~2.4M-row bucket; nothing else leaves the cluster.
4. the output dataset is one shuffle-free ``map_batches`` filter over
   the corpus (priority > ``p*``, or == ``p*`` with id <= cutoff).

``importance_sample`` is a single shuffle-free ``map_batches``; the
keep test ``u01(splitmix64(key ^ salt)) < weight`` runs in float64 on
both sides, so the DuckDB oracle re-derives the exact row set.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .hashing import splitmix64, stable_hash_strings
from .sampling import _salt, splitmix64_sql
from .textstats import _seg_count, _tokens

_LOG = logging.getLogger(__name__)

_U64 = np.uint64
_TWO64 = float(2**64)


def _batch_token_counts(tbl: pa.Table, text_column: str) -> np.ndarray:
    """Whitespace (non-empty, single-space split) token counts per row
    — identical to ``token_counts``'s ``n_tokens`` column."""
    _, parent, nonempty = _tokens(tbl.column(text_column))
    return _seg_count(parent, nonempty, tbl.num_rows)


def _priority_i64(tbl: pa.Table, priority_column: str) -> np.ndarray:
    col = tbl.column(priority_column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_integer(col.type):
        raise TypeError(
            f"priority column {priority_column!r} must be integer "
            f"(discrete); quantize continuous scores first "
            f"(got {col.type})")
    if col.null_count:
        raise ValueError(
            f"priority column {priority_column!r} has nulls; filter "
            f"or fill them before select_by_token_budget")
    return np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.int64)


def _ids_i64(tbl: pa.Table, id_column: str) -> np.ndarray:
    col = tbl.column(id_column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_integer(col.type):
        raise TypeError(
            f"id column {id_column!r} must be integer for the "
            f"(priority DESC, id ASC) total order (got {col.type})")
    return np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.int64)


def _group_sums(keys: np.ndarray, toks: np.ndarray):
    """distinct keys -> (keys, token_sums, counts), one sort pass."""
    order = np.argsort(keys, kind="stable")
    ks, ts = keys[order], toks[order]
    brk = np.ones(ks.size, dtype=bool)
    brk[1:] = ks[1:] != ks[:-1]
    firsts = np.flatnonzero(brk)
    if not firsts.size:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    sums = np.add.reduceat(ts, firsts)
    counts = np.diff(np.append(firsts, ks.size))
    return ks[firsts], sums.astype(np.int64), counts.astype(np.int64)


def _histogram(ds: ray.data.Dataset, key_fn, tok_fn) -> pa.Table:
    """Tiny driver-side (key, toks, cnt) table: per-batch distinct-key
    combiner, one small groupby.sum shuffle over distinct keys only."""

    def partial(tbl: pa.Table) -> pa.Table:
        k = key_fn(tbl)
        t = tok_fn(tbl)
        ks, ts, cs = _group_sums(k, t)
        return pa.table({"k": pa.array(ks), "toks": pa.array(ts),
                         "cnt": pa.array(cs)})

    rows = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("k").sum(["toks", "cnt"]).take_all())
    return pa.table({
        "k": pa.array([r["k"] for r in rows], pa.int64()),
        "toks": pa.array([r["sum(toks)"] for r in rows], pa.int64()),
        "cnt": pa.array([r["sum(cnt)"] for r in rows], pa.int64()),
    })


def _prefix_cut(keys: np.ndarray, toks: np.ndarray, budget: int):
    """Walk keys in the given order: (#fully-selected keys, remaining
    budget entering the first key that does NOT fully fit)."""
    cum = np.cumsum(toks)
    full = int(np.searchsorted(cum, budget, side="right"))
    spent = int(cum[full - 1]) if full else 0
    return full, budget - spent


def select_by_token_budget(
    ds: ray.data.Dataset,
    *,
    budget: int,
    priority_column: str,
    id_column: str = "doc_id",
    text_column: str = "text",
    max_boundary_rows: int = 5_000_000,
    id_bucket_count: int = 4096,
) -> ray.data.Dataset:
    """Highest-priority documents whose running whitespace-token total
    stays within ``budget``, ordered (priority DESC, id ASC).

    Returns ``(id, n_tokens)`` for the selected docs.  ``budget`` is
    inclusive: a doc is selected iff the running total THROUGH it is
    <= budget (window-``QUALIFY`` semantics; the selected set is a
    prefix of the total order).  Priorities must be discrete integers
    (quantize continuous scores first) and ids integer + unique.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")

    hist = _histogram(
        ds,
        key_fn=lambda t: _priority_i64(t, priority_column),
        tok_fn=lambda t: _batch_token_counts(t, text_column))
    if hist.num_rows == 0:
        def empty(tbl: pa.Table) -> pa.Table:
            return pa.table({id_column: pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64())})
        return ds.map_batches(empty, batch_format="pyarrow")

    p = hist.column("k").to_numpy(zero_copy_only=False)
    toks = hist.column("toks").to_numpy(zero_copy_only=False)
    cnt = hist.column("cnt").to_numpy(zero_copy_only=False)
    order = np.argsort(-p, kind="stable")  # priority DESC
    p, toks, cnt = p[order], toks[order], cnt[order]

    full, remaining = _prefix_cut(p, toks, budget)
    if full == len(p):
        boundary_p = None        # whole corpus fits the budget
        cutoff_id = None
    else:
        boundary_p = int(p[full])
        cutoff_id = _boundary_cutoff(
            ds, boundary_p, remaining,
            priority_column=priority_column, id_column=id_column,
            text_column=text_column, tier_rows=int(cnt[full]),
            max_boundary_rows=max_boundary_rows,
            id_bucket_count=id_bucket_count)

    def emit(tbl: pa.Table) -> pa.Table:
        pr = _priority_i64(tbl, priority_column)
        ids = _ids_i64(tbl, id_column)
        nt = _batch_token_counts(tbl, text_column)
        if boundary_p is None:
            mask = np.ones(tbl.num_rows, dtype=bool)
        else:
            mask = pr > boundary_p  # empty when the top tier overflows
            if cutoff_id is not None:
                mask |= (pr == boundary_p) & (ids <= cutoff_id)
        keep = np.flatnonzero(mask)
        return pa.table({id_column: pa.array(ids[keep]),
                         "n_tokens": pa.array(nt[keep])})

    return ds.map_batches(emit, batch_format="pyarrow",
                          zero_copy_batch=True)


def _boundary_cutoff(
    ds: ray.data.Dataset,
    boundary_p: int,
    remaining: int,
    *,
    priority_column: str,
    id_column: str,
    text_column: str,
    tier_rows: int,
    max_boundary_rows: int,
    id_bucket_count: int,
) -> int | None:
    """Largest id in the boundary tier such that the tier's id-ASC
    running token total through it stays <= remaining (None: no
    boundary doc fits).  ``remaining == 0`` still admits zero-token
    docs — their running total stays equal to the budget."""

    def tier(tbl: pa.Table) -> pa.Table:
        pr = _priority_i64(tbl, priority_column)
        keep = np.flatnonzero(pr == boundary_p)
        return tbl.take(pa.array(keep)) if keep.size != tbl.num_rows \
            else tbl

    tier_ds = ds.map_batches(tier, batch_format="pyarrow",
                             zero_copy_batch=True)
    if tier_rows > max_boundary_rows:
        # bucket the tier by id range; find the boundary bucket with a
        # second tiny histogram, then fold only that bucket exactly
        stats = tier_ds.map_batches(
            lambda t: pa.table({
                "lo": pa.array([int(_ids_i64(t, id_column).min())
                                if t.num_rows else 2**62]),
                "hi": pa.array([int(_ids_i64(t, id_column).max())
                                if t.num_rows else -2**62])}),
            batch_format="pyarrow").take_all()
        lo_id = min(r["lo"] for r in stats)
        hi_id = max(r["hi"] for r in stats)
        span = max(hi_id - lo_id + 1, 1)
        width = max(span // id_bucket_count, 1)

        bh = _histogram(
            tier_ds,
            key_fn=lambda t: (_ids_i64(t, id_column) - lo_id) // width,
            tok_fn=lambda t: _batch_token_counts(t, text_column))
        bk = bh.column("k").to_numpy(zero_copy_only=False)
        bt = bh.column("toks").to_numpy(zero_copy_only=False)
        bo = np.argsort(bk, kind="stable")  # id ASC
        bk, bt = bk[bo], bt[bo]
        bfull, remaining = _prefix_cut(bk, bt, remaining)
        if bfull == len(bk):
            return hi_id
        bucket = int(bk[bfull])
        lo_id = lo_id + bucket * width
        hi_id = lo_id + width - 1
        full_cut = lo_id - 1  # everything in earlier buckets selected

        def in_bucket(tbl: pa.Table) -> pa.Table:
            ids = _ids_i64(tbl, id_column)
            keep = np.flatnonzero((ids >= lo_id) & (ids <= hi_id))
            return tbl.take(pa.array(keep)) \
                if keep.size != tbl.num_rows else tbl

        tier_ds = tier_ds.map_batches(in_bucket, batch_format="pyarrow",
                                      zero_copy_batch=True)
    else:
        full_cut = None

    rows = tier_ds.map_batches(
        lambda t: pa.table({
            "id": pa.array(_ids_i64(t, id_column)),
            "nt": pa.array(_batch_token_counts(t, text_column))}),
        batch_format="pyarrow", zero_copy_batch=True).take_all()
    if not rows:
        return full_cut
    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    nt = np.array([r["nt"] for r in rows], dtype=np.int64)
    o = np.argsort(ids, kind="stable")
    ids, nt = ids[o], nt[o]
    cum = np.cumsum(nt)
    fit = int(np.searchsorted(cum, remaining, side="right"))
    if fit == 0:
        return full_cut
    return int(ids[fit - 1])


def importance_sample(
    ds: ray.data.Dataset,
    *,
    weight_column: str,
    key_column: str = "doc_id",
    seed: int = 0,
) -> ray.data.Dataset:
    """Keep each row with probability ``clamp(weight, 0, 1)``, decided
    by ``u01(splitmix64(key ^ salt)) < weight`` — deterministic in
    (key, seed, weight): re-runs and different cluster shapes keep the
    SAME rows, and raising a row's weight strictly grows the sample
    (nested subsets, like ``sample_by_hash``).  One shuffle-free
    ``map_batches``; null weights drop the row."""
    salt = _salt(seed)

    def fn(tbl: pa.Table) -> pa.Table:
        col = tbl.column(key_column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            keys = np.asarray(col.to_numpy(zero_copy_only=False)
                              ).astype(_U64)
        else:
            keys = stable_hash_strings(col.cast(pa.string()))
        with np.errstate(over="ignore"):
            u = splitmix64(keys ^ _U64(salt)).astype(np.float64) / _TWO64
        w = tbl.column(weight_column)
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        wv = np.asarray(
            pc.fill_null(pc.cast(w, pa.float64()), -1.0)
            .to_numpy(zero_copy_only=False), dtype=np.float64)
        return tbl.filter(pa.array(u < wv))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def importance_sample_sql(key_expr: str, weight_expr: str,
                          seed: int = 0) -> str:
    """The WHERE predicate matching :func:`importance_sample` for
    integer keys — identical float64 compare in DuckDB."""
    salt = _salt(seed)
    hashed = splitmix64_sql(
        f"CAST(xor(CAST({key_expr} AS UBIGINT), "
        f"CAST({salt} AS UBIGINT)) AS HUGEINT)")
    return (f"(CAST(({hashed}) AS DOUBLE) / 18446744073709551616.0) "
            f"< ({weight_expr})")
