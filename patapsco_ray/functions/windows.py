"""Windowed aggregates and sessionization over event streams.

Beyond-the-reference operators (the reference is strictly bounded
batch, SURVEY.md §2.5 "Set ops / windows / watermarks: none") for
training-data pipelines over event tables
(event_id, ts:timestamp, user_id, event_type, value).

Design for scale: tumbling windows need NO shuffle for the partial
step — each Arrow batch pre-aggregates (window, key) locally inside
``map_batches`` (vectorized), and only the small partial-aggregate
rows go through the final ``groupby``. Sessionization groups by
user — one shuffle on the session key, then a vectorized gap scan
per group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def tumbling_window_agg(
    ds: ray.data.Dataset,
    *,
    window: str = "1h",
    ts_column: str = "ts",
    key_column: str | None = "event_type",
    value_column: str = "value",
) -> ray.data.Dataset:
    """Per (window, key) count/sum/min/max over a timestamp column.

    Returns (window_start:timestamp[us], <key>, n_events,
    sum_value_1e6:int64, min_value_1e6, max_value_1e6). Values are
    1e6-scaled ints so results hash stably against a SQL oracle.
    """
    unit = {"m": 60, "h": 3600, "d": 86400}[window[-1]]
    width_us = int(window[:-1]) * unit * 1_000_000

    def partial(tbl: pa.Table) -> pa.Table:
        ts = pc.cast(tbl.column(ts_column), pa.int64()).to_numpy()
        win = (ts // width_us) * width_us
        vals = tbl.column(value_column).to_numpy().astype(np.float64)
        cols = {"w": win}
        if key_column:
            keys = tbl.column(key_column).to_pylist()
            cols["k"] = keys
        t = pa.table(
            {**{c: pa.array(v) for c, v in cols.items()},
             "v": pa.array(vals)}
        )
        group_cols = ["w"] + (["k"] if key_column else [])
        agg = t.group_by(group_cols).aggregate(
            [("v", "count"), ("v", "sum"), ("v", "min"), ("v", "max")]
        )
        return agg

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    group_cols = ["w"] + (["k"] if key_column else [])
    merged = partials.groupby(group_cols).aggregate(
        ray.data.aggregate.Sum("v_count"),
        ray.data.aggregate.Sum("v_sum"),
        ray.data.aggregate.Min("v_min"),
        ray.data.aggregate.Max("v_max"),
    )

    def finish(tbl: pa.Table) -> pa.Table:
        def scaled(col):
            return pa.array(np.floor(
                tbl.column(col).to_numpy().astype(np.float64) * 1e6 + 0.5
            ).astype(np.int64))

        out = {
            "window_start": pc.cast(
                pc.cast(tbl.column("w"), pa.int64()), pa.timestamp("us")),
        }
        if key_column:
            out[key_column] = tbl.column("k")
        out["n_events"] = pc.cast(tbl.column("sum(v_count)"), pa.int64())
        out["sum_value_1e6"] = scaled("sum(v_sum)")
        out["min_value_1e6"] = scaled("min(v_min)")
        out["max_value_1e6"] = scaled("max(v_max)")
        return pa.table(out)

    return merged.map_batches(finish, batch_format="pyarrow")


def sessionize(
    ds: ray.data.Dataset,
    *,
    gap: str = "30m",
    ts_column: str = "ts",
    key_column: str = "user_id",
) -> ray.data.Dataset:
    """Split each key's event stream into sessions separated by
    inactivity gaps > ``gap``.

    Returns (<key>, session_id (0-based per key), n_events,
    session_start, session_end). One shuffle on the key; the gap scan
    inside each group is vectorized numpy.
    """
    unit = {"m": 60, "h": 3600, "d": 86400}[gap[-1]]
    gap_us = int(gap[:-1]) * unit * 1_000_000

    def per_key(grp: pa.Table) -> pa.Table:
        ts = np.sort(pc.cast(grp.column(ts_column), pa.int64()).to_numpy())
        new_session = np.empty(len(ts), dtype=bool)
        new_session[0] = True
        new_session[1:] = np.diff(ts) > gap_us
        sid = np.cumsum(new_session) - 1
        starts = np.flatnonzero(new_session)
        ends = np.append(starts[1:], len(ts)) - 1
        n = len(starts)
        key_val = grp.column(key_column).slice(0, 1)
        return pa.table({
            key_column: key_val.take(pa.array(np.zeros(n, dtype=np.int64))),
            "session_id": pa.array(np.arange(n, dtype=np.int64)),
            "n_events": pa.array((ends - starts + 1).astype(np.int64)),
            "session_start": pc.cast(pa.array(ts[starts]),
                                     pa.timestamp("us")),
            "session_end": pc.cast(pa.array(ts[ends]), pa.timestamp("us")),
        })

    return ds.groupby(key_column).map_groups(per_key, batch_format="pyarrow")


def topk_by_key(
    ds: ray.data.Dataset,
    *,
    key_column: str = "event_type",
    value_column: str = "value",
    k: int = 5,
    id_column: str = "event_id",
) -> ray.data.Dataset:
    """Top-k rows per key by value (value desc, id asc tie-break) —
    the grouped-top-k pattern. Per-batch partial top-k inside
    map_batches bounds the shuffle to k rows per (key, block)."""

    def partial(tbl: pa.Table) -> pa.Table:
        keys = np.asarray(tbl.column(key_column).to_pylist(), dtype=object)
        vals = tbl.column(value_column).to_numpy().astype(np.float64)
        ids = tbl.column(id_column).to_numpy()
        keep = np.zeros(len(keys), dtype=bool)
        for key in np.unique(keys):
            idx = np.flatnonzero(keys == key)
            order = np.lexsort((ids[idx], -vals[idx]))[:k]
            keep[idx[order]] = True
        return tbl.filter(pa.array(keep)).select(
            [key_column, id_column, value_column])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def final(grp: pa.Table) -> pa.Table:
        vals = grp.column(value_column).to_numpy().astype(np.float64)
        ids = grp.column(id_column).to_numpy()
        order = np.lexsort((ids, -vals))[:k]
        take = pa.array(order)
        n = len(order)
        return pa.table({
            key_column: grp.column(key_column).take(take),
            id_column: grp.column(id_column).take(take),
            "rank": pa.array(np.arange(n, dtype=np.int64)),
            "value_1e6": pa.array(
                np.floor(vals[order] * 1e6 + 0.5).astype(np.int64)),
        })

    return partials.groupby(key_column).map_groups(
        final, batch_format="pyarrow")
