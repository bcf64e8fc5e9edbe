"""Exact distributed quantiles over discrete-valued columns.

Corpus curation constantly needs exact distribution cuts — "drop the
shortest 5% of documents", "what is the p99 token count" — and the
scalable exact form for a DISCRETE column (token counts, byte lengths,
quantized scores) is a value histogram: each batch collapses to
distinct ``(value, count)`` rows (``np.unique``), one ``groupby.sum``
merges them, and the tiny sorted histogram yields every requested
quantile by cumulative rank. Nothing but the histogram — bounded by
the number of DISTINCT values, not rows — ever leaves the cluster, so
a 10^12-row corpus with a few thousand distinct lengths ships a few
thousand rows total. For continuous high-cardinality columns this is
the wrong tool (the histogram approaches the data size); quantize
first or use a sketch.

Quantile semantics are DuckDB's ``quantile_disc`` (nearest-rank,
``idx = max(ceil(q*n) - 1, 0)`` over the sorted values), so results
are value-identical to the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def value_histogram(ds: ray.data.Dataset, column: str) -> ray.data.Dataset:
    """Distinct ``(value, count)`` rows for a column (null rows
    dropped), batch-combined before the single small shuffle."""

    def partial(tbl: pa.Table) -> pa.Table:
        col = tbl.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.drop_null()
        vc = pc.value_counts(col)
        return pa.table({"value": vc.field("values"),
                         "count": pc.cast(vc.field("counts"), pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("value").sum("count")
            .rename_columns({"sum(count)": "count"}))


def exact_quantiles(
    ds: ray.data.Dataset, column: str, qs: list[float]
) -> pa.Table:
    """Exact ``quantile_disc`` values for ``qs`` over ``column``.

    Returns a small driver-side Arrow table ``(q_1e6, value)`` — one
    row per requested quantile, ``q_1e6 = round(q * 1e6)``. The only
    distributed work is :func:`value_histogram`; the cumulative-rank
    walk runs over the collected histogram (distinct values only).
    """
    hist = value_histogram(ds, column).materialize()
    parts = [b for b in hist.iter_batches(batch_format="pyarrow")
             if b.num_rows]
    schema = hist.schema()
    vtype = getattr(schema, "base_schema", schema).field("value").type
    if not parts:
        return pa.table({"q_1e6": pa.array([], pa.int64()),
                         "value": pa.array([], vtype)})
    tbl = pa.concat_tables(parts)
    order = pc.sort_indices(tbl.column("value"))
    values = tbl.column("value").take(order)
    counts = tbl.column("count").take(order).to_numpy(zero_copy_only=False)
    cum = np.cumsum(counts)
    n = int(cum[-1])
    # DuckDB quantile_disc rank, evaluated in the same float64 ops
    ranks = [max(int(np.ceil(np.float64(q) * n)) - 1, 0) for q in qs]
    picks = np.searchsorted(cum, np.asarray(ranks, dtype=np.int64) + 1)
    return pa.table({
        "q_1e6": pa.array([int(round(q * 1e6)) for q in qs], pa.int64()),
        "value": values.take(pa.array(picks)),
    })
