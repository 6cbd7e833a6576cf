"""stages/joins.py — general LEFT OUTER JOIN + generic grouped
aggregate (VERDICT r4 missing item 2): DuckDB parity, SQL null
semantics, composite keys, determinism across block layouts."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from dedupe_api_ray.stages.joins import (full_outer_join, grouped_agg,
                                         left_join)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def tables():
    rng = np.random.default_rng(11)
    n_l, n_r = 2000, 1200
    left = pa.table({
        "id": pa.array(np.arange(n_l), pa.int64()),
        "k1": pa.array(rng.integers(0, 40, n_l), pa.int64()),
        "k2": pa.array([None if rng.random() < 0.1 else f"g{v}"
                        for v in rng.integers(0, 6, n_l)], pa.string()),
        "lv": pa.array(rng.integers(-50, 50, n_l), pa.int64()),
    })
    right = pa.table({
        "rk1": pa.array([None if rng.random() < 0.05 else int(v)
                         for v in rng.integers(0, 50, n_r)], pa.int64()),
        "k2": pa.array([None if rng.random() < 0.1 else f"g{v}"
                        for v in rng.integers(0, 6, n_r)], pa.string()),
        "rv": pa.array(rng.integers(0, 100, n_r), pa.int64()),
    })
    return left, right


def test_left_join_duckdb_parity(ray_session, tables):
    left, right = tables
    got = left_join(ray.data.from_arrow(left).repartition(5),
                    ray.data.from_arrow(right).repartition(3),
                    on=["k1", "k2"], right_on=["rk1", "k2"]).to_pandas()
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    want = con.sql(
        "SELECT l.id, l.k1, l.k2, l.lv, r.rv FROM l LEFT JOIN r "
        "ON l.k1 = r.rk1 AND l.k2 = r.k2").df()
    g = _canon(got[want.columns.tolist()]).astype({"rv": "float64"})
    w = _canon(want).astype({"rv": "float64"})
    assert g.equals(w)


def test_left_join_null_keys_pass_through(ray_session):
    left = pa.table({"k": pa.array([1, None, 2], pa.int64()),
                     "v": pa.array(["a", "b", "c"])})
    right = pa.table({"k": pa.array([1, None], pa.int64()),
                      "rv": pa.array([10, 99], pa.int64())})
    got = left_join(ray.data.from_arrow(left),
                    ray.data.from_arrow(right), on="k").to_pandas()
    got = _canon(got)
    # null key never matches (even null == null); unmatched keep nulls
    assert len(got) == 3
    by_v = got.set_index("v")["rv"]
    assert by_v["a"] == 10
    assert pd.isna(by_v["b"]) and pd.isna(by_v["c"])


def test_left_join_duplicate_matches_multiply(ray_session):
    left = pa.table({"k": pa.array([1, 1], pa.int64()),
                     "v": pa.array(["a", "b"])})
    right = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                      "rv": pa.array([7, 8, 9], pa.int64())})
    got = left_join(ray.data.from_arrow(left),
                    ray.data.from_arrow(right), on="k").to_pandas()
    assert len(got) == 6
    assert sorted(got["rv"]) == [7, 7, 8, 8, 9, 9]


def test_left_join_deterministic_across_layout(ray_session, tables):
    left, right = tables
    outs = []
    for nblocks in (1, 4, 9):
        got = left_join(ray.data.from_arrow(left).repartition(nblocks),
                        ray.data.from_arrow(right).repartition(nblocks),
                        on=["k1", "k2"], right_on=["rk1", "k2"],
                        num_partitions=4).to_pandas()
        outs.append(_canon(got))
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])


def test_full_outer_join_duckdb_parity(ray_session, tables):
    left, right = tables
    got = full_outer_join(ray.data.from_arrow(left).repartition(5),
                          ray.data.from_arrow(right).repartition(3),
                          on=["k1", "k2"],
                          right_on=["rk1", "k2"]).to_pandas()
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    # engine key columns carry COALESCE(l, r) keys (USING semantics);
    # l.id is never null in the fixture, so it marks the side
    want = con.sql(
        "SELECT l.id, "
        "CASE WHEN l.id IS NULL THEN r.rk1 ELSE l.k1 END AS k1, "
        "CASE WHEN l.id IS NULL THEN r.k2 ELSE l.k2 END AS k2, "
        "l.lv, r.rv FROM l FULL OUTER JOIN r "
        "ON l.k1 = r.rk1 AND l.k2 = r.k2").df()
    cast = {"rv": "float64", "id": "float64", "lv": "float64",
            "k1": "float64"}
    g = _canon(got[want.columns.tolist()]).astype(cast)
    w = _canon(want).astype(cast)
    assert g.equals(w)


def test_full_outer_join_null_key_rows_emit_unmatched(ray_session):
    left = pa.table({"k": pa.array([1, None], pa.int64()),
                     "v": pa.array(["a", "b"])})
    right = pa.table({"k": pa.array([1, None, 3], pa.int64()),
                      "rv": pa.array([10, 99, 30], pa.int64())})
    got = full_outer_join(ray.data.from_arrow(left),
                          ray.data.from_arrow(right), on="k").to_pandas()
    got = _canon(got)
    assert len(got) == 4  # a-10 matched, b null-key left, 99 + 30 right
    m = got[got["v"] == "a"]
    assert list(m["rv"]) == [10]
    assert pd.isna(got[got["v"] == "b"]["rv"]).all()
    un = got[got["v"].isna()]
    assert sorted(un["rv"]) == [30, 99]
    # right-unmatched rows carry their key (USING/COALESCE), null for
    # the null-key right row
    assert sorted(un["k"].fillna(-1)) == [-1, 3]


def test_full_outer_join_deterministic_across_layout(ray_session, tables):
    left, right = tables
    outs = []
    for nblocks in (1, 4, 9):
        got = full_outer_join(
            ray.data.from_arrow(left).repartition(nblocks),
            ray.data.from_arrow(right).repartition(nblocks),
            on=["k1", "k2"], right_on=["rk1", "k2"],
            num_partitions=4).to_pandas()
        outs.append(_canon(got))
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])


def test_left_join_collision_raises(ray_session):
    t = pa.table({"k": pa.array([1], pa.int64()),
                  "v": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="collide"):
        left_join(ray.data.from_arrow(t), ray.data.from_arrow(t), on="k")


def test_grouped_agg_duckdb_parity(ray_session, tables):
    left, _ = tables
    got = grouped_agg(
        ray.data.from_arrow(left).repartition(6),
        keys=["k1", "k2"],
        aggs={"n": ("*", "count"), "nk": ("k2", "count"),
              "s": ("lv", "sum"), "mn": ("lv", "min"),
              "mx": ("lv", "max"), "avg": ("lv", "mean")}).to_pandas()
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    want = con.sql(
        "SELECT k1, k2, count(*) AS n, count(k2) AS nk, sum(lv) AS s, "
        "min(lv) AS mn, max(lv) AS mx, "
        "cast(sum(lv) AS DOUBLE) / count(lv) AS avg "
        "FROM l GROUP BY k1, k2").df()
    cols = want.columns.tolist()
    g = _canon(got[cols])
    w = _canon(want)
    for c in ("n", "nk", "s", "mn", "mx"):
        g[c] = g[c].astype("int64")
        w[c] = w[c].astype("int64")
    assert len(g) == len(w)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_grouped_agg_null_key_groups(ray_session):
    t = pa.table({"k": pa.array([None, None, 1], pa.int64()),
                  "v": pa.array([2, 3, 5], pa.int64())})
    got = grouped_agg(ray.data.from_arrow(t), keys="k",
                      aggs={"s": ("v", "sum")}).to_pandas()
    got = got.sort_values("k", na_position="first").reset_index(drop=True)
    assert len(got) == 2
    assert pd.isna(got.loc[0, "k"]) and got.loc[0, "s"] == 5
    assert got.loc[1, "s"] == 5


def test_grouped_agg_mean_all_null_is_null(ray_session):
    t = pa.table({"k": pa.array([1, 1], pa.int64()),
                  "v": pa.array([None, None], pa.float64())})
    got = grouped_agg(ray.data.from_arrow(t), keys="k",
                      aggs={"m": ("v", "mean"),
                            "n": ("*", "count")}).to_pandas()
    assert got["n"].iloc[0] == 2
    assert pd.isna(got["m"].iloc[0])
