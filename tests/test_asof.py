"""Backward as-of join (stages/asof.py): hand-computed semantics,
brute-force parity on randomized data, parallelism invariance, and
argument validation."""

import numpy as np
import pandas as pd
import pytest

from dedupe_api_ray.stages.asof import asof_join


def _run(left, right, **kw):
    import ray.data

    ds = asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                   **kw)
    return ds.to_pandas()


@pytest.fixture(scope="module")
def tie_case():
    left = pd.DataFrame({
        "k": ["a", "a", "b", "c", "a"],
        "ts": pd.to_datetime(["2020-01-05", "2020-01-01", "2020-01-03",
                              "2020-01-02", "2020-01-02"]),
        "lid": [1, 2, 3, 4, 5]})
    right = pd.DataFrame({
        "k": ["a", "a", "a", "b"],
        "ts": pd.to_datetime(["2020-01-02", "2020-01-02", "2020-01-04",
                              "2020-01-04"]),
        "rid": [10, 11, 12, 13],
        "v": [1.5, 2.5, 3.5, 4.5]})
    return left, right


def test_asof_hand_computed(ray_session, tie_case):
    left, right = tie_case
    out = _run(left, right, left_on="k", left_ts="ts",
               right_cols=["rid", "v"], right_tiebreak="rid",
               num_partitions=5).sort_values("lid")
    # lid 1 (a, 01-05): latest a-order <= is 01-04 → rid 12
    # lid 2 (a, 01-01): nothing at-or-before → null
    # lid 3 (b, 01-03): b's only row is 01-04 (after) → null
    # lid 4 (c): no right rows for key → null
    # lid 5 (a, 01-02): INCLUSIVE tie, two right rows at 01-02 →
    #   higher tiebreak wins → rid 11
    assert out["lid"].tolist() == [1, 2, 3, 4, 5]
    got = [None if pd.isna(x) else int(x) for x in out["rid_asof"]]
    assert got == [12, None, None, None, 11]
    v = [None if pd.isna(x) else x for x in out["v_asof"]]
    assert v == [3.5, None, None, None, 2.5]


def test_asof_left_columns_and_types_survive(ray_session, tie_case):
    left, right = tie_case
    ds_out = _run(left, right, left_on="k", left_ts="ts",
                  right_cols=["rid"], right_tiebreak="rid")
    assert list(ds_out.columns) == ["k", "ts", "lid", "rid_asof"]
    assert len(ds_out) == len(left)
    assert ds_out["lid"].dtype == np.int64  # not floated by the union


def _brute_asof(left, right, key, ts, cols, tb):
    rows = []
    for _, lr in left.iterrows():
        cand = right[(right[key] == lr[key]) & (right[ts] <= lr[ts])]
        rec = dict(lr)
        if len(cand):
            best = cand.sort_values([ts, tb], ascending=False).iloc[0]
            for c in cols:
                rec[f"{c}_asof"] = best[c]
        else:
            for c in cols:
                rec[f"{c}_asof"] = None
        rows.append(rec)
    return pd.DataFrame(rows)


def test_asof_matches_bruteforce_randomized(ray_session):
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    # few keys + coarse integer timestamps → many exact ts ties
    left = pd.DataFrame({
        "k": rng.integers(0, 12, n_l),
        "ts": rng.integers(0, 40, n_l).astype(np.int64),
        "lid": np.arange(n_l, dtype=np.int64)})
    right = pd.DataFrame({
        "k": rng.integers(0, 15, n_r),
        "ts": rng.integers(0, 40, n_r).astype(np.int64),
        "rid": np.arange(n_r, dtype=np.int64),
        "w": rng.normal(size=n_r)})
    got = _run(left, right, left_on="k", left_ts="ts",
               right_cols=["rid", "w"], right_tiebreak="rid") \
        .sort_values("lid").reset_index(drop=True)
    want = _brute_asof(left, right, "k", "ts", ["rid", "w"], "rid") \
        .sort_values("lid").reset_index(drop=True)
    g = [None if pd.isna(x) else int(x) for x in got["rid_asof"]]
    w = [None if pd.isna(x) else int(x) for x in want["rid_asof"]]
    assert g == w
    gw = got["w_asof"].fillna(0.0).to_numpy()
    ww = want["w_asof"].astype(np.float64).fillna(0.0).to_numpy()
    assert np.allclose(gw, ww)


def test_asof_parallelism_invariant(ray_session):
    rng = np.random.default_rng(11)
    n = 500
    left = pd.DataFrame({
        "k": rng.integers(0, 9, n), "ts": rng.integers(0, 50, n),
        "lid": np.arange(n)})
    right = pd.DataFrame({
        "k": rng.integers(0, 9, n), "ts": rng.integers(0, 50, n),
        "rid": np.arange(n)})
    outs = []
    for parts in (2, 17):
        outs.append(_run(left, right, left_on="k", left_ts="ts",
                         right_cols=["rid"], right_tiebreak="rid",
                         num_partitions=parts)
                    .sort_values("lid").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_asof_distinct_side_names(ray_session):
    # left/right key+ts columns under different names
    left = pd.DataFrame({"u": [1, 1], "at": [5, 1], "lid": [0, 1]})
    right = pd.DataFrame({"cust": [1], "odate": [3], "price": [9.5]})
    out = _run(left, right, left_on="u", right_on="cust", left_ts="at",
               right_ts="odate", right_cols=["price"]) \
        .sort_values("lid")
    p = [None if pd.isna(x) else x for x in out["price_asof"]]
    assert p == [9.5, None]


def test_asof_dtype_mismatch_and_nulls(ray_session):
    # arrow-typed inputs (the parquet shape): int32 right key + null
    # keys/ts on both sides — dtype-blind partition hashing or
    # null-matching would corrupt all of these
    import pyarrow as pa
    import ray.data

    left = pa.table({"k": pa.array([-1, -1, None, 5], pa.int64()),
                     "ts": pa.array([10, 0, 10, 10], pa.int64()),
                     "lid": pa.array([0, 1, 2, 3], pa.int64())})
    right = pa.table({"k": pa.array([-1, None, 5, 5], pa.int32()),
                      "ts": pa.array([3, 1, None, 2], pa.int64()),
                      "rid": pa.array([10, 11, 12, 13], pa.int64())})
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    left_on="k", left_ts="ts", right_cols=["rid"],
                    right_tiebreak="rid", num_partitions=6) \
        .to_pandas().sort_values("lid")
    got = [None if pd.isna(x) else int(x) for x in out["rid_asof"]]
    # lid0: k=-1 matches int32 -1 row (ts 3<=10) → 10
    # lid1: ts 0 before everything → null
    # lid2: null key never matches (even the null-key right row)
    # lid3: k=5 rows are null-ts (dropped) except ts=2 → 13
    assert got == [10, None, None, 13]


def test_asof_ns_resolution_not_truncated(ray_session):
    # right row 800ns AFTER the left ts, same microsecond: us
    # truncation would wrongly match it
    base = pd.Timestamp("2020-01-01 00:00:00.000000100")
    left = pd.DataFrame({"k": [1], "ts": [base], "lid": [0]})
    right = pd.DataFrame({"k": [1, 1],
                          "ts": [base + pd.Timedelta(800, "ns"),
                                 base - pd.Timedelta(50, "ns")],
                          "rid": [99, 42]})
    out = _run(left, right, left_on="k", left_ts="ts",
               right_cols=["rid"], right_tiebreak="rid")
    assert out["rid_asof"].tolist() == [42]


def test_asof_validation_errors(ray_session):
    left = pd.DataFrame({"k": [1], "ts": [1], "v_asof": [2]})
    right = pd.DataFrame({"k": [1], "ts": [1], "v": [3]})
    import ray.data

    with pytest.raises(ValueError, match="already exist"):
        asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                  left_on="k", left_ts="ts", right_cols=["v"])
    with pytest.raises(ValueError, match="lacks columns"):
        asof_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                  left_on="k", left_ts="ts", right_cols=["nope"])
