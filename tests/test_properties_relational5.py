"""Hypothesis differential fuzz, part 5: the window offset family —
lag / lead / cumsum (ROWS UNBOUNDED PRECEDING) vs DuckDB, with a
unique final order column so the frame is fully deterministic."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dedupe_api_ray.stages.windows import window_over

FUZZ = settings(max_examples=8, deadline=None,
                suppress_health_check=list(HealthCheck))

rows_st = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),    # partition key
              st.integers(min_value=0, max_value=3),    # tie-heavy order
              st.integers(min_value=-99, max_value=99)),  # value
    min_size=1, max_size=30)


@FUZZ
@given(rows_st)
def test_fuzz_window_lag_lead_cumsum_matches_duckdb(ray_session, rows):
    t = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "o": pa.array([r[1] for r in rows], pa.int64()),
        "v": pa.array([r[2] for r in rows], pa.int64()),
        "id": pa.array(np.arange(len(rows)), pa.int64()),
    })
    got = window_over(ray.data.from_arrow(t), partition_by="k",
                      order_by=["o", "id"],
                      lag={"pv": "v"}, lead={"nv": "v"},
                      cumsum={"cs": "v"},
                      num_partitions=2).to_pandas()
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.sql(
        "SELECT k, o, v, id, "
        "lag(v) OVER w AS pv, lead(v) OVER w AS nv, "
        "sum(v) OVER (PARTITION BY k ORDER BY o, id "
        "             ROWS UNBOUNDED PRECEDING) AS cs "
        "FROM t WINDOW w AS (PARTITION BY k ORDER BY o, id)").df()
    cols = list(want.columns)
    g, w = got[cols].copy(), want.copy()
    for c in cols:
        g[c] = pd.to_numeric(g[c], errors="coerce").astype("float64")
        w[c] = pd.to_numeric(w[c], errors="coerce").astype("float64")
    g = g.sort_values(cols).reset_index(drop=True)
    w = w.sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
