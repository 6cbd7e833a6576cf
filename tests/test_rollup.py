"""ROLLUP aggregate (stages/rollup.py): pandas parity at every level,
grouping_id mask, int exactness, layout invariance."""

import numpy as np
import pandas as pd
import pytest

from dedupe_api_ray.stages.rollup import rollup_aggregate


def test_rollup_matches_pandas(ray_session):
    import ray.data

    rng = np.random.default_rng(23)
    df = pd.DataFrame({"a": rng.choice(list("xyz"), 900),
                       "b": rng.integers(0, 4, 900),
                       "v": rng.integers(-50, 50, 900)})
    got = rollup_aggregate(
        ray.data.from_pandas([d for _, d in df.groupby(df.index % 5)]),
        keys=["a", "b"], sums={"sv": "v"}).to_pandas()
    assert set(got["grouping_id"]) == {0, 2, 3}
    lvl0 = got[got["grouping_id"] == 0].set_index(["a", "b"]).sort_index()
    want0 = df.groupby(["a", "b"]).agg(sv=("v", "sum"), n=("v", "size"))
    np.testing.assert_array_equal(lvl0["sv"], want0["sv"])
    np.testing.assert_array_equal(lvl0["n"], want0["n"])
    lvl1 = got[got["grouping_id"] == 2].set_index("a").sort_index()
    assert lvl1["b"].isna().all()
    want1 = df.groupby("a").agg(sv=("v", "sum"), n=("v", "size"))
    np.testing.assert_array_equal(lvl1["sv"], want1["sv"])
    lvl2 = got[got["grouping_id"] == 3]
    assert len(lvl2) == 1
    assert lvl2["a"].isna().all() and lvl2["b"].isna().all()
    assert int(lvl2["sv"].iloc[0]) == df["v"].sum()
    assert int(lvl2["n"].iloc[0]) == len(df)


def test_rollup_guards(ray_session):
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"a": [1], "v": [2]}))
    with pytest.raises(ValueError, match="at least one key"):
        rollup_aggregate(ds, keys=[], sums={"sv": "v"})
    with pytest.raises(ValueError, match="collides"):
        rollup_aggregate(ds, keys=["a"], sums={"a": "v"})


def test_rollup_empty_input_emits_grand_total(ray_session):
    import ray.data

    ds = ray.data.from_pandas(
        pd.DataFrame({"a": ["x"], "b": [1], "v": [2]})).filter(
        lambda r: False)
    got = rollup_aggregate(ds, keys=["a", "b"],
                           sums={"sv": "v"}).to_pandas()
    # SQL GROUP BY ROLLUP over an empty table: ONE grand-total row
    assert len(got) == 1
    assert got["a"].isna().all() and got["b"].isna().all()
    assert got["sv"].isna().all()
    assert int(got["n"].iloc[0]) == 0
    assert int(got["grouping_id"].iloc[0]) == 3
