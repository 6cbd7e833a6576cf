"""Hypothesis differential fuzz, part 3: grouped quantiles (rank and
linear interpolation), grouped distinct count, and ROLLUP — vs DuckDB
on randomized tie-heavy tables.  Same adversarial-oracle rationale as
parts 1–2."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dedupe_api_ray.stages.distinct import grouped_distinct_count
from dedupe_api_ray.stages.quantiles import grouped_quantiles
from dedupe_api_ray.stages.rollup import rollup_aggregate

FUZZ = settings(max_examples=8, deadline=None,
                suppress_health_check=list(HealthCheck))


def _cmp(got: pd.DataFrame, want: pd.DataFrame) -> None:
    if len(want) == 0 and len(got) == 0:
        return
    cols = list(want.columns)
    g, w = got[cols].copy(), want.copy()
    for c in cols:
        if g[c].dtype.kind in "fiu" or w[c].dtype.kind in "fiu":
            g[c] = pd.to_numeric(g[c], errors="coerce").astype("float64")
            w[c] = pd.to_numeric(w[c], errors="coerce").astype("float64")
    g = g.sort_values(cols).reset_index(drop=True)
    w = w.sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                  atol=1e-9, rtol=0)


# tie-heavy: few keys, narrow value range
kv_rows = st.lists(st.tuples(st.integers(min_value=0, max_value=3),
                             st.integers(min_value=0, max_value=20)),
                   min_size=1, max_size=30)


@FUZZ
@given(kv_rows)
def test_fuzz_grouped_quantiles_rank_matches_duckdb(ray_session, rows):
    t = pa.table({"k": pa.array([r[0] for r in rows], pa.int64()),
                  "v": pa.array([r[1] for r in rows], pa.int64())})
    got = grouped_quantiles(ray.data.from_arrow(t), key="k", col="v",
                            qs=[0.5, 0.9, 0.99],
                            num_partitions=2).to_pandas()
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.sql("""
        WITH r AS (
          SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY v) rn,
                 count(*) OVER (PARTITION BY k) c
          FROM t
        ), qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q)
        SELECT k, cast(q AS DOUBLE) AS q, v AS value
        FROM qs, r
        WHERE rn = cast(ceil(cast(q AS DOUBLE) * c) AS BIGINT)""").df()
    _cmp(got, want)


@FUZZ
@given(kv_rows)
def test_fuzz_grouped_quantiles_linear_matches_duckdb(ray_session, rows):
    t = pa.table({"k": pa.array([r[0] for r in rows], pa.int64()),
                  "v": pa.array([r[1] for r in rows], pa.int64())})
    got = grouped_quantiles(ray.data.from_arrow(t), key="k", col="v",
                            qs=[0.5, 0.9], interpolation="linear",
                            num_partitions=2).to_pandas()
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    # the engine's exact interpolation expression, replayed term by
    # term (same shape as the events_type_quantiles_cont oracle)
    want = con.sql("""
        WITH r AS (
          SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY v) rn,
                 count(*) OVER (PARTITION BY k) c
          FROM t
        ), qs AS (SELECT unnest([0.5, 0.9]) AS q),
        b AS (
          SELECT g.k, cast(q AS DOUBLE) AS q, g.c,
                 cast(q AS DOUBLE) * (g.c - 1) AS h,
                 cast(floor(cast(q AS DOUBLE) * (g.c - 1)) AS BIGINT) lo
          FROM (SELECT DISTINCT k, c FROM r) g, qs
        )
        SELECT b.k, b.q,
               round(vlo.v + (b.h - b.lo) * (vhi.v - vlo.v), 6) AS value
        FROM b
        JOIN r vlo ON vlo.k = b.k AND vlo.rn = b.lo + 1
        JOIN r vhi ON vhi.k = b.k
                  AND vhi.rn = least(b.lo + 2, b.c)""").df()
    _cmp(got, want)


nval = st.one_of(st.none(), st.integers(min_value=0, max_value=6))


@FUZZ
@given(st.lists(st.tuples(st.integers(min_value=0, max_value=3), nval),
                min_size=1, max_size=30))
def test_fuzz_grouped_distinct_count_matches_duckdb(ray_session, rows):
    t = pa.table({"k": pa.array([r[0] for r in rows], pa.int64()),
                  "v": pa.array([r[1] for r in rows], pa.int64())})
    got = grouped_distinct_count(ray.data.from_arrow(t), key="k",
                                 col="v", num_partitions=2).to_pandas()
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.sql(
        "SELECT k, count(*) AS n_rows, count(DISTINCT v) AS n_distinct "
        "FROM t GROUP BY k").df()
    _cmp(got, want)


@FUZZ
@given(st.lists(st.tuples(st.sampled_from(["x", "y"]),
                          st.integers(min_value=0, max_value=2),
                          st.integers(min_value=-50, max_value=50)),
                max_size=30))
def test_fuzz_rollup_matches_duckdb(ray_session, rows):
    t = pa.table({"k1": pa.array([r[0] for r in rows], pa.string()),
                  "k2": pa.array([r[1] for r in rows], pa.int64()),
                  "v": pa.array([r[2] for r in rows], pa.int64())})
    got = rollup_aggregate(ray.data.from_arrow(t), keys=["k1", "k2"],
                           sums={"s": "v"},
                           num_partitions=2).to_pandas()
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.sql(
        "SELECT k1, k2, cast(sum(v) AS BIGINT) AS s, count(*) AS n, "
        "cast(grouping(k1) + 2 * grouping(k2) AS BIGINT) AS grouping_id "
        "FROM t GROUP BY ROLLUP(k1, k2)").df()
    _cmp(got, want)
