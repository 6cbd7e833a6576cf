"""Interval (range) join (stages/ranges.py): inclusive-bound
semantics, brute-force parity with variable widths, parallelism
invariance, empty sides, validation."""

import numpy as np
import pandas as pd
import pytest

from dedupe_api_ray.stages.ranges import interval_join


def _run(left, right, **kw):
    import ray.data

    ds = interval_join(ray.data.from_pandas(left),
                       ray.data.from_pandas(right), **kw)
    return ds.to_pandas()


def test_interval_inclusive_bounds_and_keys(ray_session):
    left = pd.DataFrame({"k": ["a", "a", "a", "b", "c"],
                         "ts": [4, 5, 9, 6, 6], "lid": [0, 1, 2, 3, 4]})
    right = pd.DataFrame({"k": ["a", "a", "b"], "s": [5, 1, 0],
                          "e": [8, 5, 10], "rid": [10, 11, 12]})
    out = _run(left, right, left_on="k", left_ts="ts", right_start="s",
               right_end="e", right_cols=["rid"], num_partitions=4)
    pairs = sorted(zip(out["lid"], out["rid_iv"]))
    # lid0 (a,4): in [1,5] only            → (0,11)
    # lid1 (a,5): in [5,8] AND [1,5] (both ends inclusive)
    # lid2 (a,9): after both a-intervals   → nothing
    # lid3 (b,6): in [0,10]                → (3,12)
    # lid4 (c,6): no c intervals           → nothing
    assert pairs == [(0, 11), (1, 10), (1, 11), (3, 12)]


def test_interval_matches_bruteforce_randomized(ray_session):
    rng = np.random.default_rng(3)
    n_l, n_r = 500, 200
    left = pd.DataFrame({"k": rng.integers(0, 10, n_l),
                         "ts": rng.integers(0, 100, n_l).astype(np.int64),
                         "lid": np.arange(n_l)})
    right = pd.DataFrame({"k": rng.integers(0, 12, n_r),
                          "s": rng.integers(0, 100, n_r).astype(np.int64),
                          "rid": np.arange(n_r)})
    right["e"] = right["s"] + rng.integers(0, 25, n_r)  # variable widths
    m = left.merge(right, on="k")
    want = m[(m.ts >= m.s) & (m.ts <= m.e)][["lid", "rid"]] \
        .sort_values(["lid", "rid"]).reset_index(drop=True)
    got = _run(left, right, left_on="k", left_ts="ts", right_start="s",
               right_end="e", right_cols=["rid"], num_partitions=7)
    got = got[["lid", "rid_iv"]].rename(columns={"rid_iv": "rid"}) \
        .sort_values(["lid", "rid"]).reset_index(drop=True)
    assert len(want) > 500  # non-trivial overlap volume
    pd.testing.assert_frame_equal(want.astype(np.int64),
                                  got.astype(np.int64))


def test_interval_parallelism_invariant(ray_session):
    rng = np.random.default_rng(5)
    n = 400
    left = pd.DataFrame({"k": rng.integers(0, 8, n),
                         "ts": rng.integers(0, 60, n), "lid": np.arange(n)})
    right = pd.DataFrame({"k": rng.integers(0, 8, n // 2),
                          "s": rng.integers(0, 60, n // 2),
                          "rid": np.arange(n // 2)})
    right["e"] = right["s"] + 10
    outs = []
    for parts in (2, 19):
        outs.append(
            _run(left, right, left_on="k", left_ts="ts", right_start="s",
                 right_end="e", right_cols=["rid"], num_partitions=parts)
            .sort_values(["lid", "rid_iv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_interval_empty_right_and_degenerate(ray_session):
    left = pd.DataFrame({"k": [1, 2], "ts": [1, 2], "lid": [0, 1]})
    right = pd.DataFrame({"k": pd.Series(dtype=np.int64),
                          "s": pd.Series(dtype=np.int64),
                          "e": pd.Series(dtype=np.int64),
                          "rid": pd.Series(dtype=np.int64)})
    out = _run(left, right, left_on="k", left_ts="ts", right_start="s",
               right_end="e", right_cols=["rid"])
    # Ray's map_groups emits schema-less blocks for all-empty output,
    # so only the row count is asserted here
    assert len(out) == 0
    # end < start intervals never match and don't poison the width
    right2 = pd.DataFrame({"k": [1, 1], "s": [5, 1], "e": [0, 1],
                           "rid": [7, 8]})
    out2 = _run(left, right2, left_on="k", left_ts="ts", right_start="s",
                right_end="e", right_cols=["rid"])
    assert sorted(zip(out2["lid"], out2["rid_iv"])) == [(0, 8)]


def test_interval_dtype_mismatch_and_nulls(ray_session):
    import pyarrow as pa
    import ray.data

    # arrow-typed inputs (the parquet shape): true nulls, int32 right
    # key vs int64 left key — dtype-blind partition hashing or
    # null-matching would corrupt this
    left = pa.table({"k": pa.array([-3, -3, None, 1], pa.int64()),
                     "ts": pa.array([5, None, 5, 0], pa.int64()),
                     "lid": pa.array([0, 1, 2, 3], pa.int64())})
    right = pa.table({"k": pa.array([-3, None, 1, 1], pa.int32()),
                      "s": pa.array([0, 0, None, -2], pa.int64()),
                      "e": pa.array([9, 9, 9, None], pa.int64()),
                      "rid": pa.array([10, 11, 12, 13], pa.int64())})
    out = interval_join(ray.data.from_arrow(left),
                        ray.data.from_arrow(right),
                        left_on="k", left_ts="ts", right_start="s",
                        right_end="e", right_cols=["rid"],
                        num_partitions=5).to_pandas()
    # only lid0 matches: int32 key -3 interval [0,9] contains ts 5;
    # null ts/key left rows and null key/start/end intervals drop
    assert sorted(zip(out["lid"], out["rid_iv"])) == [(0, 10)]


def test_interval_validation_errors(ray_session):
    import ray.data

    left = pd.DataFrame({"k": [1], "ts": [1], "rid_iv": [2]})
    right = pd.DataFrame({"k": [1], "s": [1], "e": [2], "rid": [3]})
    with pytest.raises(ValueError, match="already exist"):
        interval_join(ray.data.from_pandas(left),
                      ray.data.from_pandas(right), left_on="k",
                      left_ts="ts", right_start="s", right_end="e",
                      right_cols=["rid"])
    left_ok = pd.DataFrame({"k": [1], "ts": [1]})
    with pytest.raises(ValueError, match="lacks columns"):
        interval_join(ray.data.from_pandas(left_ok),
                      ray.data.from_pandas(right), left_on="k",
                      left_ts="ts", right_start="nope", right_end="e",
                      right_cols=["rid"])
