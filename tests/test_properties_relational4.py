"""Hypothesis differential fuzz, part 4: sessionize vs the SQL
lag/gap-break CTE — timestamps engineered to land on the exact
30-minute gap boundary (kept in-session, `> gap` breaks), duplicate
timestamps (tie-broken by event_id on both sides), single-event
sessions, multiple interleaved users."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dedupe_api_ray.extras.sessions import sessionize

FUZZ = settings(max_examples=8, deadline=None,
                suppress_health_check=list(HealthCheck))

BASE = np.datetime64("2024-01-01T00:00:00", "us")

# offsets in minutes, multiples of 15 → gaps of exactly 30 min are
# common (the inclusive boundary), as are 45-min breaks
event = st.tuples(st.integers(min_value=0, max_value=2),    # user_id
                  st.integers(min_value=0, max_value=16),   # 15-min slot
                  st.integers(min_value=-99, max_value=99))  # value


@FUZZ
@given(st.lists(event, min_size=1, max_size=30))
def test_fuzz_sessionize_matches_duckdb(ray_session, rows):
    t = pa.table({
        "event_id": pa.array(np.arange(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([BASE + np.timedelta64(r[1] * 15, "m")
                        for r in rows], pa.timestamp("us")),
        "value": pa.array([float(r[2]) for r in rows], pa.float64()),
    })
    got = sessionize(ray.data.from_arrow(t),
                     num_partitions=2).to_pandas()
    con = duckdb.connect()
    con.register("events", t.to_pandas())
    want = con.sql("""
        WITH o AS (
          SELECT user_id, event_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, ts, value,
                 sum(brk) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
          FROM o
        )
        SELECT user_id, cast(session_id AS BIGINT) AS session_id,
               count(*) AS n_events,
               cast(round(sum(value) * 100, 0) AS BIGINT)
                 AS sum_value_cents,
               min(ts) AS session_start, max(ts) AS session_end
        FROM s GROUP BY user_id, session_id""").df()
    cols = list(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want.sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
