"""Hypothesis differential fuzz, part 2: as-of join (vs DuckDB's
native ASOF LEFT JOIN), interval join and semi/anti (EXISTS / NOT
EXISTS) — randomized keys, timestamps with ties, duplicate rows,
empty sides.  Same adversarial-oracle rationale as
test_properties_relational.py."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dedupe_api_ray.stages.asof import asof_join
from dedupe_api_ray.stages.ranges import interval_join
from dedupe_api_ray.stages.semi import anti_join, semi_join

FUZZ = settings(max_examples=8, deadline=None,
                suppress_health_check=list(HealthCheck))

key = st.integers(min_value=0, max_value=3)
ts = st.integers(min_value=0, max_value=20)
val = st.integers(min_value=-99, max_value=99)


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


@FUZZ
@given(st.lists(st.tuples(key, ts), min_size=1, max_size=25),
       st.lists(st.tuples(key, ts, val), max_size=25))
def test_fuzz_asof_join_matches_duckdb(ray_session, lrows, rrows):
    # dedupe right (k, ts): with duplicate timestamps DuckDB's ASOF
    # pick is unspecified while the engine uses right_tiebreak
    seen, rdedup = set(), []
    for r in rrows:
        if r[:2] not in seen:
            seen.add(r[:2])
            rdedup.append(r)
    left = pa.table({
        "k": pa.array([r[0] for r in lrows], pa.int64()),
        "ts": pa.array([r[1] for r in lrows], pa.int64()),
        "lid": pa.array(np.arange(len(lrows)), pa.int64()),
    })
    right = pa.table({
        "k": pa.array([r[0] for r in rdedup], pa.int64()),
        "ts": pa.array([r[1] for r in rdedup], pa.int64()),
        "rv": pa.array([r[2] for r in rdedup], pa.int64()),
    })
    got = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    left_on="k", left_ts="ts", right_cols=["rv"],
                    num_partitions=2).to_pandas()
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    want = con.sql(
        "SELECT l.k, l.ts, l.lid, r.rv AS rv_asof FROM l "
        "ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts").df()
    _cmp(got, want)


@FUZZ
@given(st.lists(st.tuples(key, ts), min_size=1, max_size=25),
       st.lists(st.tuples(key, ts, st.integers(min_value=0, max_value=8),
                          val), max_size=20))
def test_fuzz_interval_join_matches_duckdb(ray_session, lrows, rrows):
    left = pa.table({
        "k": pa.array([r[0] for r in lrows], pa.int64()),
        "ts": pa.array([r[1] for r in lrows], pa.int64()),
        "lid": pa.array(np.arange(len(lrows)), pa.int64()),
    })
    right = pa.table({
        "k": pa.array([r[0] for r in rrows], pa.int64()),
        "lo": pa.array([r[1] for r in rrows], pa.int64()),
        "hi": pa.array([r[1] + r[2] for r in rrows], pa.int64()),
        "rv": pa.array([r[3] for r in rrows], pa.int64()),
    })
    got = interval_join(ray.data.from_arrow(left),
                        ray.data.from_arrow(right),
                        left_on="k", left_ts="ts", right_start="lo",
                        right_end="hi", right_cols=["rv"],
                        num_partitions=2).to_pandas()
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    want = con.sql(
        "SELECT l.k, l.ts, l.lid, r.rv AS rv_iv FROM l JOIN r "
        "ON l.k = r.k AND l.ts BETWEEN r.lo AND r.hi").df()
    _cmp(got, want)


nkey = st.one_of(st.none(), st.integers(min_value=0, max_value=4))


@FUZZ
@given(st.lists(st.tuples(nkey, val), min_size=1, max_size=25),
       st.lists(nkey, max_size=15))
def test_fuzz_semi_anti_join_matches_duckdb(ray_session, lrows, rkeys):
    left = pa.table({
        "k": pa.array([r[0] for r in lrows], pa.int64()),
        "v": pa.array([r[1] for r in lrows], pa.int64()),
        "lid": pa.array(np.arange(len(lrows)), pa.int64()),
    })
    right = pa.table({"k": pa.array(rkeys, pa.int64())})
    sg = semi_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                   left_on="k", num_partitions=2).to_pandas()
    ag = anti_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                   left_on="k", num_partitions=2).to_pandas()
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    sw = con.sql("SELECT l.* FROM l WHERE EXISTS "
                 "(SELECT 1 FROM r WHERE r.k = l.k)").df()
    aw = con.sql("SELECT l.* FROM l WHERE NOT EXISTS "
                 "(SELECT 1 FROM r WHERE r.k = l.k)").df()
    _cmp(sg, sw)
    _cmp(ag, aw)
    # semi + anti partition the left exactly
    assert len(sg) + len(ag) == len(left)
