"""Hypothesis differential fuzz for the round-5 relational kernels —
LEFT / FULL OUTER JOIN, grouped_agg and the window rank family — vs
DuckDB on randomized small tables: nullable composite keys, duplicate
keys, all-null columns, empty sides, order-by ties.  Complements the
fixed-seed parity tests in test_joins.py / test_windows.py with
adversarial shapes (the r4 advisor's bug classes — null-key
semantics, dtype edges, tie handling — are exactly what randomized
oracles catch)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dedupe_api_ray.stages.joins import (full_outer_join, grouped_agg,
                                         left_join)
from dedupe_api_ray.stages.windows import window_over

# each example runs a real Ray Data pipeline (~1 s): few, adversarial
# examples — shrinking still gives a minimal counterexample on failure
FUZZ = settings(max_examples=8, deadline=None,
                suppress_health_check=list(HealthCheck))

key_int = st.one_of(st.none(), st.integers(min_value=0, max_value=4))
key_str = st.one_of(st.none(), st.sampled_from(["a", "b"]))
val_int = st.one_of(st.none(), st.integers(min_value=-99, max_value=99))

join_rows = st.lists(st.tuples(key_int, key_str, val_int), max_size=25)


def _left_table(rows):
    return pa.table({
        "lid": pa.array(np.arange(len(rows)), pa.int64()),
        "k1": pa.array([r[0] for r in rows], pa.int64()),
        "k2": pa.array([r[1] for r in rows], pa.string()),
        "lv": pa.array([r[2] for r in rows], pa.int64()),
    })


def _right_table(rows):
    return pa.table({
        "k1": pa.array([r[0] for r in rows], pa.int64()),
        "k2": pa.array([r[1] for r in rows], pa.string()),
        "rv": pa.array([r[2] for r in rows], pa.int64()),
    })


def _cmp(got: pd.DataFrame, want: pd.DataFrame) -> None:
    if len(want) == 0 and len(got) == 0:
        return  # engine may emit a schema-less empty frame
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


@FUZZ
@given(join_rows, join_rows)
def test_fuzz_left_join_matches_duckdb(ray_session, lrows, rrows):
    left, right = _left_table(lrows), _right_table(rrows)
    got = left_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    on=["k1", "k2"], num_partitions=2).to_pandas()
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    want = con.sql(
        "SELECT l.lid, l.k1, l.k2, l.lv, r.rv FROM l LEFT JOIN r "
        "ON l.k1 = r.k1 AND l.k2 = r.k2").df()
    _cmp(got, want)


@FUZZ
@given(join_rows, join_rows)
def test_fuzz_full_outer_join_matches_duckdb(ray_session, lrows, rrows):
    left, right = _left_table(lrows), _right_table(rrows)
    got = full_outer_join(ray.data.from_arrow(left),
                          ray.data.from_arrow(right),
                          on=["k1", "k2"], num_partitions=2).to_pandas()
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    # engine key columns carry COALESCE(l, r) keys (USING semantics);
    # lid is never null on the left, so it marks the side
    want = con.sql(
        "SELECT l.lid, "
        "CASE WHEN l.lid IS NULL THEN r.k1 ELSE l.k1 END AS k1, "
        "CASE WHEN l.lid IS NULL THEN r.k2 ELSE l.k2 END AS k2, "
        "l.lv, r.rv FROM l FULL OUTER JOIN r "
        "ON l.k1 = r.k1 AND l.k2 = r.k2").df()
    _cmp(got, want)


@FUZZ
@given(st.lists(st.tuples(key_int, key_str, val_int),
                min_size=1, max_size=30))
def test_fuzz_grouped_agg_matches_duckdb(ray_session, rows):
    t = pa.table({
        "k1": pa.array([r[0] for r in rows], pa.int64()),
        "k2": pa.array([r[1] for r in rows], pa.string()),
        "v": pa.array([r[2] for r in rows], pa.int64()),
    })
    got = grouped_agg(
        ray.data.from_arrow(t), keys=["k1", "k2"],
        aggs={"n": ("*", "count"), "nv": ("v", "count"),
              "s": ("v", "sum"), "mn": ("v", "min"),
              "mx": ("v", "max"), "avg": ("v", "mean")},
        num_partitions=2).to_pandas()
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.sql(
        "SELECT k1, k2, count(*) AS n, count(v) AS nv, "
        "cast(sum(v) AS BIGINT) AS s, min(v) AS mn, max(v) AS mx, "
        "avg(cast(v AS DOUBLE)) AS avg FROM t GROUP BY k1, k2").df()
    _cmp(got, want)


window_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),   # partition key
              st.integers(min_value=0, max_value=3)),  # tie-heavy order
    min_size=1, max_size=30)


@FUZZ
@given(window_rows, st.integers(min_value=1, max_value=5))
def test_fuzz_window_row_number_ntile_matches_duckdb(ray_session, rows, nt):
    t = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "o": pa.array([r[1] for r in rows], pa.int64()),
        "id": pa.array(np.arange(len(rows)), pa.int64()),
    })
    # unique final order column → row_number / ntile deterministic
    got = window_over(ray.data.from_arrow(t), partition_by="k",
                      order_by=["o", "id"], row_number="rn",
                      ntile={"nt": nt}, num_partitions=2).to_pandas()
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.sql(
        "SELECT k, o, id, "
        "row_number() OVER (PARTITION BY k ORDER BY o, id) AS rn, "
        f"ntile({nt}) OVER (PARTITION BY k ORDER BY o, id) AS nt "
        "FROM t").df()
    _cmp(got, want)


@FUZZ
@given(window_rows)
def test_fuzz_window_rank_family_matches_duckdb(ray_session, rows):
    t = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "o": pa.array([r[1] for r in rows], pa.int64()),
        "id": pa.array(np.arange(len(rows)), pa.int64()),
    })
    # ties in o: rank / dense_rank / percent_rank are tie-aware and
    # deterministic even though row order within a tie is not
    got = window_over(ray.data.from_arrow(t), partition_by="k",
                      order_by=["o"], rank="rk", dense_rank="drk",
                      percent_rank="prk", num_partitions=2).to_pandas()
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.sql(
        "SELECT k, o, id, "
        "rank() OVER (PARTITION BY k ORDER BY o) AS rk, "
        "dense_rank() OVER (PARTITION BY k ORDER BY o) AS drk, "
        "percent_rank() OVER (PARTITION BY k ORDER BY o) AS prk "
        "FROM t").df()
    _cmp(got, want)
