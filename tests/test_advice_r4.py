"""Regression tests for the round-4 ADVICE findings: nullable-int64
float64 promotion in the partition-kernel factorize paths (semi/anti
membership, grouped distinct count, _sort_key_ints), the window NaN
ordering guard, and write_entity_map's stale-file row count."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

BIG = 2 ** 53  # float64 loses integer exactness above here


def _nullable_int64(vals):
    return pa.chunked_array([pa.array(vals, pa.int64())])


def test_sort_key_ints_big_ints_with_nulls():
    """_sort_key_ints must not float-promote a NULLABLE int64 column:
    2^53 and 2^53+1 need distinct codes, null stays -1 and distinct
    from a genuine 0."""
    from dedupe_api_ray.stages.asof import _sort_key_ints

    col = _nullable_int64([BIG, BIG + 1, None, 0, BIG])
    codes = _sort_key_ints(col)
    assert codes[0] != codes[1]          # 2^53 vs 2^53+1 stay distinct
    assert codes[0] == codes[4]          # equal values share a code
    assert codes[2] == -1                # null → -1
    assert codes[3] != -1                # genuine 0 is not the null code
    assert codes[1] > codes[0] > codes[3]  # order preserved

    # null-free column: raw int64 values pass through exactly
    dense = _nullable_int64([BIG, BIG + 1, 0])
    out = _sort_key_ints(dense)
    assert out.tolist() == [BIG, BIG + 1, 0]


def test_semi_anti_join_big_int_keys_with_null(ray_session):
    """A null-key left row used to float-promote the WHOLE partition's
    key array, collapsing keys >= 2^53 → false membership."""
    from dedupe_api_ray.stages.semi import anti_join, semi_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([BIG, BIG + 1, None], pa.int64()),
        "v": pa.array([1, 2, 3], pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([BIG], pa.int64())}))

    semi = semi_join(left, right, left_on="k").to_pandas()
    assert semi["v"].tolist() == [1]     # only the exact key matches

    anti = anti_join(left, right, left_on="k").to_pandas()
    assert sorted(anti["v"].tolist()) == [2, 3]  # null kept (NOT EXISTS)


def test_grouped_distinct_big_int_values_with_null(ray_session):
    """Distinct VALUES >= 2^53 in a nullable column must not collapse
    (distinct undercount)."""
    from dedupe_api_ray.stages.distinct import grouped_distinct_count

    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(["a"] * 4, pa.string()),
        "x": pa.array([BIG, BIG + 1, None, BIG], pa.int64())}))
    out = grouped_distinct_count(ds, key="g", col="x").to_pandas()
    assert out["n_rows"].tolist() == [4]
    assert out["n_distinct"].tolist() == [2]


def test_window_order_by_nan_raises(ray_session):
    """A float NaN passes the null check but would factorize to -1 and
    sort FIRST; the kernel now raises loudly like grouped_quantiles."""
    from dedupe_api_ray.stages.windows import window_over

    t = pa.table({"k": pa.array([1, 1], pa.int64()),
                  "o": pa.array([1.0, float("nan")], pa.float64())})
    ds = ray.data.from_arrow(t)
    with pytest.raises(Exception, match="NaN"):
        window_over(ds, partition_by="k", order_by=["o"],
                    row_number="rn").to_pandas()


def test_window_cumsum_nan_raises(ray_session):
    from dedupe_api_ray.stages.windows import window_over

    t = pa.table({"k": pa.array([1, 1], pa.int64()),
                  "o": pa.array([1, 2], pa.int64()),
                  "x": pa.array([1.0, float("nan")], pa.float64())})
    ds = ray.data.from_arrow(t)
    with pytest.raises(Exception, match="NaN"):
        window_over(ds, partition_by="k", order_by=["o"],
                    cumsum={"run": "x"}).to_pandas()


def test_write_entity_map_ignores_stale_files(ray_session, tmp_path):
    """The reported row count comes from the written dataset, not a
    re-read of the output directory — files from a previous run in the
    same path must not inflate it."""
    from dedupe_api_ray.sources.io import write_entity_map

    em = ray.data.from_arrow(pa.table({
        "record_id": pa.array([1, 2, 3], pa.int64()),
        "cluster_id": pa.array([1, 1, 3], pa.int64())}))
    path = str(tmp_path / "em")
    assert write_entity_map(em, path) == 3
    # second write into the SAME directory: count is still 3, not 6
    assert write_entity_map(em, path) == 3
