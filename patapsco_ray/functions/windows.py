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


def _field_type(ds: ray.data.Dataset, column: str) -> pa.DataType:
    """Input column type (metadata-only for parquet-backed datasets);
    used to pin explicit output schemas so empty shuffle partitions
    can't emit schema-less blocks (Ray warns 'RefBundle with a
    different schema ... new schema: <empty>')."""
    schema = ds.schema()
    base = getattr(schema, "base_schema", schema)
    return base.field(column).type


def _pin(schema: pa.Schema):
    """Terminal map that normalizes every block (including the empty
    ones Ray's shuffle can produce) to one explicit schema."""

    def fn(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return schema.empty_table()
        return tbl.cast(schema)

    return fn


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
    out_fields = [("window_start", pa.timestamp("us"))]
    if key_column:
        out_fields.append((key_column, _field_type(ds, key_column)))
    out_fields += [("n_events", pa.int64()), ("sum_value_1e6", pa.int64()),
                   ("min_value_1e6", pa.int64()), ("max_value_1e6", pa.int64())]
    out_schema = pa.schema(out_fields)

    def partial(tbl: pa.Table) -> pa.Table:
        ts = pc.cast(tbl.column(ts_column), pa.int64()).to_numpy()
        win = (ts // width_us) * width_us
        vals = tbl.column(value_column).to_numpy().astype(np.float64)
        t_cols = {"w": pa.array(win)}
        if key_column:
            # zero-copy column reuse: no Python-object round-trip
            t_cols["k"] = tbl.column(key_column).combine_chunks()
        t_cols["v"] = pa.array(vals)
        t = pa.table(t_cols)
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
        if tbl.num_rows == 0:
            return out_schema.empty_table()

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
        return pa.table(out).cast(out_schema)

    return merged.map_batches(finish, batch_format="pyarrow").map_batches(
        _pin(out_schema), batch_format="pyarrow")


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

    # shuffle key is hash(user) % P, NOT the user itself: each Ray
    # group call then handles a whole partition of users with one
    # vectorized scan instead of one Python call per user (the
    # per-key map_groups pattern collapses at web-scale key counts)
    num_parts = max(int(ray.cluster_resources().get("CPU", 4)) * 2, 8)
    out_schema = pa.schema([
        (key_column, _field_type(ds, key_column)),
        ("session_id", pa.int64()),
        ("n_events", pa.int64()),
        ("session_start", pa.timestamp("us")),
        ("session_end", pa.timestamp("us")),
    ])

    def add_part(tbl: pa.Table) -> pa.Table:
        # drop file-level (pandas) schema metadata: it makes pa.Schema
        # unhashable and trips Ray's schema dedup in the shuffle
        tbl = tbl.replace_schema_metadata(None)
        keys = pc.cast(tbl.column(key_column), pa.string()).combine_chunks()
        from .hashing import hash_strings

        part = (hash_strings(keys) % np.uint64(num_parts)).astype(np.int64)
        return tbl.append_column("part", pa.array(part))

    def per_part(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return out_schema.empty_table()
        grp = grp.combine_chunks()
        order = pa.compute.sort_indices(
            grp.select([key_column, ts_column]),
            sort_keys=[(key_column, "ascending"), (ts_column, "ascending")],
        )
        grp = grp.take(order)
        ts = pc.cast(grp.column(ts_column), pa.int64()).to_numpy()
        keys = grp.column(key_column).to_numpy(zero_copy_only=False)
        n = len(ts)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        new_session = new_key.copy()
        new_session[1:] |= np.diff(ts) > gap_us
        snum = np.cumsum(new_session) - 1           # global session number
        starts = np.flatnonzero(new_session)
        ends = np.append(starts[1:], n) - 1
        # 0-based session id per key: subtract each key's first session
        key_first_snum = snum[np.flatnonzero(new_key)]
        key_index = np.cumsum(new_key) - 1
        sid = snum - key_first_snum[key_index]
        return pa.table({
            key_column: grp.column(key_column).take(pa.array(starts)),
            "session_id": pa.array(sid[starts].astype(np.int64)),
            "n_events": pa.array((ends - starts + 1).astype(np.int64)),
            "session_start": pc.cast(pa.array(ts[starts]),
                                     pa.timestamp("us")),
            "session_end": pc.cast(pa.array(ts[ends]), pa.timestamp("us")),
        }).cast(out_schema)

    return (
        ds.map_batches(add_part, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("part")
        .map_groups(lambda g: per_part(g.drop_columns(["part"])),
                    batch_format="pyarrow")
        .map_batches(_pin(out_schema), batch_format="pyarrow")
    )


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

    out_schema = pa.schema([
        (key_column, _field_type(ds, key_column)),
        (id_column, _field_type(ds, id_column)),
        ("rank", pa.int64()),
        ("value_1e6", pa.int64()),
    ])

    def partial(tbl: pa.Table) -> pa.Table:
        tbl = tbl.replace_schema_metadata(None)
        # vectorized grouped top-k: one lexsort of the whole batch by
        # (key, -value, id), then keep each key's first k rows
        vals = tbl.column(value_column).to_numpy().astype(np.float64)
        ids = tbl.column(id_column).to_numpy(zero_copy_only=False)
        key_codes = (pc.dictionary_encode(
            tbl.column(key_column).combine_chunks())
            .indices.to_numpy().astype(np.int64, copy=False))
        order = np.lexsort((ids, -vals, key_codes))
        sk = key_codes[order]
        run_start = np.empty(len(sk), dtype=bool)
        if len(sk):
            run_start[0] = True
            run_start[1:] = sk[1:] != sk[:-1]
        pos_in_run = np.arange(len(sk)) - np.maximum.accumulate(
            np.where(run_start, np.arange(len(sk)), 0))
        keep_sorted = order[pos_in_run < k]
        keep = np.zeros(len(sk), dtype=bool)
        keep[keep_sorted] = True
        return tbl.filter(pa.array(keep)).select(
            [key_column, id_column, value_column])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def final(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return out_schema.empty_table()
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
        }).cast(out_schema)

    return partials.groupby(key_column).map_groups(
        final, batch_format="pyarrow").map_batches(
        _pin(out_schema), batch_format="pyarrow")


def sliding_window_agg(
    ds: ray.data.Dataset,
    *,
    window: str = "1h",
    slide: str = "30m",
    ts_column: str = "ts",
    key_column: str | None = "event_type",
    value_column: str = "value",
) -> ray.data.Dataset:
    """Sliding (hopping) windows: each event contributes to
    ``window/slide`` overlapping windows. Implemented as a vectorized
    explode inside ``map_batches`` (np.repeat over the hop count) into
    (window_start, key) partials, then the same small-key groupby as
    the tumbling path — the shuffle still moves only partials.
    """
    unit = {"m": 60, "h": 3600, "d": 86400}
    width_us = int(window[:-1]) * unit[window[-1]] * 1_000_000
    slide_us = int(slide[:-1]) * unit[slide[-1]] * 1_000_000
    if width_us % slide_us:
        raise ValueError("window must be a multiple of slide")
    hops = width_us // slide_us
    out_fields = [("window_start", pa.timestamp("us"))]
    if key_column:
        out_fields.append((key_column, _field_type(ds, key_column)))
    out_fields += [("n_events", pa.int64()), ("sum_value_1e6", pa.int64())]
    out_schema = pa.schema(out_fields)

    def partial(tbl: pa.Table) -> pa.Table:
        ts = pc.cast(tbl.column(ts_column), pa.int64()).to_numpy()
        vals = tbl.column(value_column).to_numpy().astype(np.float64)
        n = len(ts)
        # the windows containing t start at
        # floor(t/slide)*slide - j*slide for j in 0..hops-1, clipped to
        # starts where t < start + width
        base = (ts // slide_us) * slide_us
        rep_ts = np.repeat(base, hops) - np.tile(
            np.arange(hops, dtype=np.int64) * slide_us, n)
        rep_vals = np.repeat(vals, hops)
        keep = rep_ts + width_us > np.repeat(ts, hops)
        t_cols = {"w": pa.array(rep_ts[keep]), "v": pa.array(rep_vals[keep])}
        if key_column:
            # replicate the key column via an Arrow take on source-row
            # indices (kept-row index // hops) — no Python objects
            src = np.flatnonzero(keep) // hops
            t_cols["k"] = tbl.column(key_column).take(pa.array(src))
        t = pa.table(t_cols)
        group_cols = ["w"] + (["k"] if key_column else [])
        return t.group_by(group_cols).aggregate(
            [("v", "count"), ("v", "sum")])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    group_cols = ["w"] + (["k"] if key_column else [])
    merged = partials.groupby(group_cols).aggregate(
        ray.data.aggregate.Sum("v_count"),
        ray.data.aggregate.Sum("v_sum"),
    )

    def finish(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return out_schema.empty_table()
        out = {
            "window_start": pc.cast(
                pc.cast(tbl.column("w"), pa.int64()), pa.timestamp("us")),
        }
        if key_column:
            out[key_column] = tbl.column("k")
        out["n_events"] = pc.cast(tbl.column("sum(v_count)"), pa.int64())
        out["sum_value_1e6"] = pa.array(np.floor(
            tbl.column("sum(v_sum)").to_numpy().astype(np.float64) * 1e6
            + 0.5).astype(np.int64))
        return pa.table(out).cast(out_schema)

    return merged.map_batches(finish, batch_format="pyarrow").map_batches(
        _pin(out_schema), batch_format="pyarrow")
