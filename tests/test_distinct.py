"""Grouped distinct count (stages/distinct.py): pandas parity, SQL
null semantics, string columns, layout/parallelism invariance."""

import numpy as np
import pandas as pd

from dedupe_api_ray.stages.distinct import grouped_distinct_count


def test_distinct_count_matches_pandas(ray_session):
    import ray.data

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.integers(0, 30, 2000),
                       "v": rng.integers(0, 80, 2000)})
    want = df.groupby("k").agg(n_rows=("v", "size"),
                               n_distinct=("v", "nunique"))
    prev = None
    for blocks, parts in ((1, 4), (9, 13)):
        ds = ray.data.from_pandas(
            [d for _, d in df.groupby(df.index % blocks)]
            if blocks > 1 else df)
        got = grouped_distinct_count(ds, key="k", col="v",
                                     num_partitions=parts).to_pandas() \
            .set_index("k").sort_index()
        np.testing.assert_array_equal(got["n_rows"], want["n_rows"])
        np.testing.assert_array_equal(got["n_distinct"],
                                      want["n_distinct"])
        if prev is not None:
            pd.testing.assert_frame_equal(got, prev)
        prev = got


def test_distinct_count_null_semantics(ray_session):
    import pyarrow as pa
    import ray.data

    # k=1: rows [a, a, None, b] → n_rows 4 (null counted),
    # n_distinct 2 (null excluded), per SQL COUNT semantics
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "v": pa.array(["a", "a", None, "b", None], pa.string())}))
    got = grouped_distinct_count(ds, key="k", col="v").to_pandas() \
        .set_index("k").sort_index()
    assert list(got["n_rows"]) == [4, 1]
    assert list(got["n_distinct"]) == [2, 0]


def test_distinct_count_probe_skip_path(ray_session):
    """A block big enough to trigger the head-slice probe
    (>4*65,536 rows) with mostly-unique pairs takes the skip branch
    (no map-side hash agg) and must still count exactly; a duplicate-
    heavy block of the same size takes the combine branch."""
    import ray.data

    n = (1 << 18) + 1024
    rng = np.random.default_rng(11)
    for v_card in (n * 4, 50):  # unique-ish → skip; heavy dups → combine
        df = pd.DataFrame({"k": rng.integers(0, 64, n),
                           "v": rng.integers(0, v_card, n)})
        got = grouped_distinct_count(ray.data.from_pandas(df),
                                     key="k", col="v").to_pandas() \
            .set_index("k").sort_index()
        want = df.groupby("k").agg(n_rows=("v", "size"),
                                   n_distinct=("v", "nunique"))
        np.testing.assert_array_equal(got["n_rows"], want["n_rows"])
        np.testing.assert_array_equal(got["n_distinct"],
                                      want["n_distinct"])


def test_distinct_count_composite_key(ray_session):
    import ray.data

    rng = np.random.default_rng(41)
    df = pd.DataFrame({"a": rng.integers(0, 6, 1500),
                       "b": rng.choice(list("pq"), 1500),
                       "v": rng.integers(0, 40, 1500)})
    got = grouped_distinct_count(ray.data.from_pandas(df),
                                 key=["a", "b"], col="v").to_pandas() \
        .set_index(["a", "b"]).sort_index()
    want = df.groupby(["a", "b"]).agg(n_rows=("v", "size"),
                                      n_distinct=("v", "nunique"))
    np.testing.assert_array_equal(got["n_rows"], want["n_rows"])
    np.testing.assert_array_equal(got["n_distinct"], want["n_distinct"])
