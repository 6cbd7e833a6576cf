"""Exact quantiles (stages/quantiles.py): order-statistic parity with
a full sort, refinement levels under a tiny collect cap, duplicate
saturation, ints vs floats, null exclusion, NaN guard."""

import numpy as np
import pandas as pd
import pytest

from dedupe_api_ray.stages.quantiles import (_from_key, _to_keys,
                                             exact_quantiles)


def _want(vals, qs):
    s = np.sort(np.asarray(vals))
    return [s[int(np.ceil(q * len(s))) - 1] for q in qs]


def test_key_transform_is_order_preserving():
    rng = np.random.default_rng(1)
    f = np.r_[rng.normal(0, 1e6, 500), -0.0, 0.0, 1e-300, -1e-300]
    k = _to_keys(f)
    np.testing.assert_array_equal(np.argsort(k, kind="stable"),
                                  np.argsort(f, kind="stable"))
    for v in (-3.5, 0.0, 7e9):
        assert _from_key(int(_to_keys(np.array([v]))[0]), True) == v
    i = rng.integers(-(1 << 62), 1 << 62, 500)
    ki = _to_keys(i)
    np.testing.assert_array_equal(np.argsort(ki, kind="stable"),
                                  np.argsort(i, kind="stable"))
    assert _from_key(int(_to_keys(np.array([-17], np.int64))[0]),
                     False) == -17


def test_quantiles_match_sort(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    vals = np.r_[rng.normal(100, 50, 4000),
                 np.repeat(42.5, 800),          # heavy duplicate mass
                 rng.uniform(-1e6, 1e6, 200)]
    qs = [0.01, 0.1, 0.5, 0.9, 0.99, 1.0]
    ds = ray.data.from_pandas(
        [pd.DataFrame({"v": c}) for c in np.array_split(vals, 5)])
    out = exact_quantiles(ds, "v", qs).to_pandas()
    np.testing.assert_array_equal(out["value"].to_numpy(),
                                  _want(vals, qs))


def test_quantiles_refinement_and_int_path(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    vals = rng.integers(-10_000, 10_000, 5000)
    qs = [0.25, 0.5, 0.75]
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals}))
    # collect_cap=1 forces refinement to shift 0, where a repeated key
    # must resolve arithmetically without collecting
    out = exact_quantiles(ds, "v", qs, collect_cap=1).to_pandas()
    np.testing.assert_array_equal(out["value"].to_numpy(),
                                  _want(vals, qs))
    assert out["value"].dtype == np.int64


def test_quantiles_nulls_and_guards(ray_session):
    import ray.data

    df = pd.DataFrame({"v": [5.0, None, 1.0, None, 3.0]})
    out = exact_quantiles(ray.data.from_pandas(df), "v",
                          [0.5, 1.0]).to_pandas()
    assert list(out["value"]) == [3.0, 5.0]  # nulls excluded from rank
    with pytest.raises(ValueError, match="must be in"):
        exact_quantiles(ray.data.from_pandas(df), "v", [0.0])
    # pandas NaN becomes Arrow null on conversion; a REAL NaN value
    # needs an Arrow-native fixture
    import pyarrow as pa
    nan_ds = ray.data.from_arrow(pa.table(
        {"v": pa.array([1.0, float("nan"), 2.0], pa.float64())}))
    with pytest.raises(Exception, match="NaN"):
        exact_quantiles(nan_ds, "v", [0.5])


def test_grouped_quantiles_match_pandas(ray_session):
    import ray.data

    from dedupe_api_ray.stages.quantiles import grouped_quantiles

    rng = np.random.default_rng(13)
    df = pd.DataFrame({"k": rng.integers(0, 20, 3000),
                       "v": rng.normal(0, 100, 3000)})
    qs = [0.25, 0.5, 0.95]

    def want(g):
        s = np.sort(g.to_numpy())
        return {q: s[int(np.ceil(q * len(s))) - 1] for q in qs}

    exp = {k: want(g["v"]) for k, g in df.groupby("k")}
    prev = None
    for blocks, parts in ((1, 4), (6, 9)):
        ds = ray.data.from_pandas(
            [d for _, d in df.groupby(df.index % blocks)]
            if blocks > 1 else df)
        got = grouped_quantiles(ds, key="k", col="v", qs=qs,
                                num_partitions=parts).to_pandas()
        assert len(got) == 20 * len(qs)
        for _, row in got.iterrows():
            assert exp[row["k"]][row["q"]] == row["value"]
        key = got.sort_values(["k", "q"]).reset_index(drop=True)
        if prev is not None:
            pd.testing.assert_frame_equal(key, prev)
        prev = key


def test_grouped_quantiles_all_null_key(ray_session):
    import pyarrow as pa
    import ray.data

    from dedupe_api_ray.stages.quantiles import grouped_quantiles

    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 2], pa.int64()),
        "v": pa.array([5.0, 1.0, None, None], pa.float64())}))
    got = grouped_quantiles(ds, key="k", col="v", qs=[0.5]).to_pandas() \
        .set_index("k").sort_index()
    assert got.loc[1, "value"] == 1.0      # ceil(0.5*2)=1 → min
    assert pd.isna(got.loc[2, "value"])    # all-null key keeps its row


def test_grouped_quantiles_nan_guard(ray_session):
    import pyarrow as pa
    import ray.data

    from dedupe_api_ray.stages.quantiles import grouped_quantiles

    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "v": pa.array([1.0, float("nan")], pa.float64())}))
    with pytest.raises(Exception, match="NaN"):
        grouped_quantiles(ds, key="k", col="v", qs=[0.5]).to_pandas()


def test_quantiles_temporal_column(ray_session):
    import pyarrow as pa
    import ray.data

    from dedupe_api_ray.stages.quantiles import exact_quantiles

    rng = np.random.default_rng(31)
    ticks = np.sort(rng.integers(0, 10**12, 999))
    ts = ticks.astype("datetime64[us]")
    ds = ray.data.from_arrow(pa.table(
        {"ts": pa.array(ts, pa.timestamp("us"))}))
    out = exact_quantiles(ds, "ts", [0.25, 0.5, 1.0])
    assert out["value"].type == pa.timestamp("us")
    got = out["value"].to_numpy(zero_copy_only=False)
    want = [ts[int(np.ceil(q * 999)) - 1] for q in (0.25, 0.5, 1.0)]
    np.testing.assert_array_equal(got, np.array(want))


def test_grouped_quantiles_linear_matches_numpy(ray_session):
    import ray.data

    from dedupe_api_ray.stages.quantiles import grouped_quantiles

    rng = np.random.default_rng(37)
    df = pd.DataFrame({"k": rng.integers(0, 12, 2400),
                       "v": rng.normal(0, 50, 2400)})
    qs = [0.1, 0.5, 0.9]
    got = grouped_quantiles(ray.data.from_pandas(df), key="k", col="v",
                            qs=qs, interpolation="linear").to_pandas()
    for _, row in got.iterrows():
        want = np.percentile(
            df.loc[df["k"] == row["k"], "v"].to_numpy(), row["q"] * 100,
            method="linear")
        assert abs(row["value"] - want) < 1.5e-6  # engine rounds at 6dp

    # single-value key: linear collapses to the value itself
    one = pd.DataFrame({"k": [1], "v": [7.25]})
    g1 = grouped_quantiles(ray.data.from_pandas(one), key="k", col="v",
                           qs=[0.5], interpolation="linear").to_pandas()
    assert g1["value"].iloc[0] == 7.25
    import pytest as _pt
    s = pd.DataFrame({"k": [1], "v": ["x"]})
    with _pt.raises(Exception, match="numeric"):
        grouped_quantiles(ray.data.from_pandas(s), key="k", col="v",
                          qs=[0.5], interpolation="linear").to_pandas()
    with _pt.raises(ValueError, match="interpolation"):
        grouped_quantiles(ray.data.from_pandas(one), key="k", col="v",
                          qs=[0.5], interpolation="cubic")


def test_grouped_quantiles_composite_key(ray_session):
    import ray.data

    from dedupe_api_ray.stages.quantiles import grouped_quantiles

    rng = np.random.default_rng(43)
    df = pd.DataFrame({"a": rng.integers(0, 4, 1200),
                       "b": rng.integers(0, 3, 1200),
                       "v": rng.normal(0, 10, 1200)})
    got = grouped_quantiles(ray.data.from_pandas(df), key=["a", "b"],
                            col="v", qs=[0.5]).to_pandas()
    assert len(got) == 12
    for _, row in got.iterrows():
        s = np.sort(df.loc[(df["a"] == row["a"]) & (df["b"] == row["b"]),
                           "v"].to_numpy())
        assert row["value"] == s[int(np.ceil(0.5 * len(s))) - 1]
