"""Windowed aggregates / sessionization / grouped top-k over events,
checked against DuckDB oracles."""

import duckdb
import pytest

import ray.data

from patapsco_ray.functions import sessionize, topk_by_key, tumbling_window_agg

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events_ds(ray_session):
    return ray.data.read_parquet(EVENTS)


def test_tumbling_window_vs_sql(events_ds):
    got = tumbling_window_agg(events_ds, window="1h").to_pandas()
    got = got.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    want = duckdb.sql(f"""
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type,
          count(*) AS n_events,
          CAST(FLOOR(sum(value)*1000000 + 0.5) AS BIGINT) AS sum_value_1e6,
          CAST(FLOOR(min(value)*1000000 + 0.5) AS BIGINT) AS min_value_1e6,
          CAST(FLOOR(max(value)*1000000 + 0.5) AS BIGINT) AS max_value_1e6
        FROM '{EVENTS}' GROUP BY 1, 2 ORDER BY 1, 2""").df()
    assert len(got) == len(want) > 0
    assert (got["n_events"].values == want["n_events"].values).all()
    assert (got["sum_value_1e6"].values == want["sum_value_1e6"].values).all()
    assert (got["min_value_1e6"].values == want["min_value_1e6"].values).all()
    assert (got["max_value_1e6"].values == want["max_value_1e6"].values).all()
    assert (got["window_start"].values == want["window_start"].values).all()


def test_sessionize_vs_sql(events_ds):
    got = sessionize(events_ds, gap="30m", key_column="user_id").to_pandas()
    got = got.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    want = duckdb.sql(f"""
        WITH o AS (
          SELECT user_id, ts,
            CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 > INTERVAL 30 MINUTE OR
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
            THEN 1 ELSE 0 END AS new_s
          FROM '{EVENTS}'),
        s AS (SELECT user_id, ts,
              sum(new_s) OVER (PARTITION BY user_id ORDER BY ts) - 1 AS sid
              FROM o)
        SELECT user_id, CAST(sid AS BIGINT) AS session_id, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM s GROUP BY 1, 2 ORDER BY 1, 2""").df()
    assert len(got) == len(want) > 0
    for col in ("user_id", "session_id", "n_events"):
        assert (got[col].values == want[col].values).all(), col
    assert (got["session_start"].values == want["session_start"].values).all()
    assert (got["session_end"].values == want["session_end"].values).all()


def test_topk_by_key_vs_sql(events_ds):
    got = topk_by_key(events_ds, k=3).to_pandas()
    got = got.sort_values(["event_type", "rank"]).reset_index(drop=True)
    want = duckdb.sql(f"""
        SELECT event_type, event_id,
          CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY value DESC, event_id) - 1 AS BIGINT) AS rank,
          CAST(FLOOR(value*1000000 + 0.5) AS BIGINT) AS value_1e6
        FROM '{EVENTS}' QUALIFY rank < 3 ORDER BY event_type, rank""").df()
    assert len(got) == len(want) > 0
    assert (got["event_id"].values == want["event_id"].values).all()
    assert (got["value_1e6"].values == want["value_1e6"].values).all()


def test_sliding_window_vs_sql(events_ds):
    from patapsco_ray.functions import sliding_window_agg

    got = sliding_window_agg(events_ds, window="1h", slide="30m").to_pandas()
    got = got.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    want = duckdb.sql(f"""
        WITH h AS (SELECT unnest(range(0, 2)) AS j),
        w AS (SELECT e.event_type, e.value, e.ts,
               time_bucket(INTERVAL 30 MINUTE, e.ts)
                 - to_minutes(30 * j::INT) AS window_start
              FROM '{EVENTS}' e CROSS JOIN h)
        SELECT window_start, event_type, count(*) AS n_events,
          CAST(FLOOR(sum(value)*1000000 + 0.5) AS BIGINT) AS sum_value_1e6
        FROM w WHERE window_start + INTERVAL 1 HOUR > ts
        GROUP BY 1, 2 ORDER BY 1, 2""").df()
    assert len(got) == len(want) > 0
    assert (got["n_events"].values == want["n_events"].values).all()
    assert (got["sum_value_1e6"].values == want["sum_value_1e6"].values).all()
    assert (got["window_start"].values == want["window_start"].values).all()


def test_sliding_requires_multiple():
    from patapsco_ray.functions import sliding_window_agg

    with pytest.raises(ValueError):
        sliding_window_agg(None, window="1h", slide="25m")
