"""Global top-k (stages/topk.py): exactness vs a full sort, mixed
directions, ties, nulls-last prune safety, validation."""

import numpy as np
import pandas as pd
import pytest

from dedupe_api_ray.stages.topk import global_topk


def test_global_topk_exact_vs_full_sort(ray_session):
    import ray.data

    rng = np.random.default_rng(13)
    # coarse values → many ties across block boundaries
    df = pd.DataFrame({"v": rng.integers(0, 40, 1000),
                       "id": np.arange(1000)})
    ds = ray.data.from_pandas(
        [d for _, d in df.groupby(df.index % 9)])
    got = global_topk(ds, ["v", "id"], 25,
                      descending=[True, False]).to_pandas()
    want = df.sort_values(["v", "id"], ascending=[False, True]).head(25)
    assert got["id"].tolist() == want["id"].tolist()
    assert got["v"].tolist() == want["v"].tolist()


def test_global_topk_null_sort_keys_excluded(ray_session):
    import ray.data

    df = pd.DataFrame({"v": [np.nan, 3.0, np.nan, 1.0, 2.0],
                       "id": [0, 1, 2, 3, 4]})
    ds = ray.data.from_pandas([df.iloc[:3], df.iloc[3:]])
    got = global_topk(ds, ["v"], 2, descending=True).to_pandas()
    assert got["id"].tolist() == [1, 4]  # NULLS-LAST parity
    # fewer than k non-null rows: only the non-null rows come back
    few = global_topk(ds, ["v"], 5, descending=True).to_pandas()
    assert few["id"].tolist() == [1, 4, 3]


def test_global_topk_k_larger_than_input(ray_session):
    import ray.data

    df = pd.DataFrame({"v": [2, 1], "id": [0, 1]})
    got = global_topk(ray.data.from_pandas(df), ["v"], 10).to_pandas()
    assert got["v"].tolist() == [1, 2]


def test_global_topk_validation(ray_session):
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"v": [1]}))
    with pytest.raises(ValueError, match="positive"):
        global_topk(ds, ["v"], 0)
    with pytest.raises(ValueError, match="match sort_cols"):
        global_topk(ds, ["v"], 1, descending=[True, False])
