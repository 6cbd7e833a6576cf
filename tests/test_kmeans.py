"""Distributed k-means (extras/similarity.kmeans_fit): blob recovery,
determinism across block layouts, empty-cluster retention."""

import numpy as np
import pandas as pd
import pytest


def _blobs(n_per=60, d=8, seed=3):
    rng = np.random.default_rng(seed)
    centers = np.array([[10.0] * d, [-10.0] * d,
                        [10.0] * (d // 2) + [-10.0] * (d - d // 2)])
    rows, labels = [], []
    for c, ctr in enumerate(centers):
        rows.append(ctr + rng.normal(0, 0.5, (n_per, d)))
        labels += [c] * n_per
    x = np.vstack(rows)
    order = rng.permutation(len(x))
    return x[order], np.array(labels)[order]


def test_kmeans_recovers_blobs_and_is_layout_invariant(ray_session):
    import ray.data

    from dedupe_api_ray.extras.similarity import kmeans_fit

    x, labels = _blobs()
    df = pd.DataFrame({"vec_id": np.arange(len(x)),
                       "embedding": list(x)})
    prev = None
    for blocks in (1, 5):
        ds = ray.data.from_pandas(
            [d for _, d in df.groupby(df.index % blocks)]
            if blocks > 1 else df)
        cent, assigns = kmeans_fit(ds, k=3, iters=4)
        got = assigns.to_pandas().sort_values("vec_id") \
            .reset_index(drop=True)
        # perfect recovery: each gold blob maps to exactly one cluster
        for b in range(3):
            assert got.loc[labels == b, "cluster_id"].nunique() == 1
        assert got["cluster_id"].nunique() == 3
        key = got[["cluster_id", "dist"]].to_numpy().tolist()
        if prev is not None:
            assert key == prev  # byte-identical across layouts
        prev = key
        assert cent.shape == (3, 8)


def test_kmeans_empty_cluster_and_guard(ray_session):
    import ray.data

    from dedupe_api_ray.extras.similarity import kmeans_fit

    # two identical far points + a k=3 init where one centroid can
    # end up memberless: it must keep its previous position, not NaN
    x = np.array([[0.0, 0.0], [0.1, 0.0], [50.0, 50.0],
                  [50.1, 50.0], [0.05, 0.0]])
    df = pd.DataFrame({"vec_id": np.arange(5), "embedding": list(x)})
    ds = ray.data.from_pandas(df)
    cent, assigns = kmeans_fit(ds, k=3, iters=3)
    assert np.isfinite(cent).all()
    got = assigns.to_pandas()
    assert set(got["cluster_id"]) <= {0, 1, 2}
    with pytest.raises(ValueError, match="only"):
        kmeans_fit(ds, k=9, iters=1)
