"""Deterministic sampling (extras/sampling.py): Bernoulli threshold
filter, exact stratified quotas, block-layout invariance (the
combiner property), validation."""

import numpy as np
import pandas as pd
import pytest

from dedupe_api_ray.extras.sampling import (bernoulli_sample,
                                            fraction_threshold,
                                            sample_hash,
                                            stratified_sample)


def _docs(n=600, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(["en", "de", "zh"], n),
        "source": rng.choice(["a", "b"], n)})


def test_bernoulli_deterministic_and_near_fraction(ray_session):
    import ray.data

    df = _docs()
    outs = []
    for blocks in (1, 7):
        ds = ray.data.from_pandas([d for _, d in
                                   df.groupby(df.index % blocks)]) \
            if blocks > 1 else ray.data.from_pandas(df)
        out = bernoulli_sample(ds, id_col="doc_id", fraction=0.3,
                               seed=5).to_pandas()
        outs.append(set(out["doc_id"]))
    assert outs[0] == outs[1]  # block layout cannot change the sample
    frac = len(outs[0]) / len(df)
    assert 0.2 < frac < 0.4
    # membership is exactly the hash threshold rule
    h = sample_hash(df["doc_id"].to_numpy(), 5)
    want = set(df["doc_id"][h < np.uint64(fraction_threshold(0.3))])
    assert outs[0] == want


def test_stratified_exact_quota_and_layout_invariance(ray_session):
    import ray.data

    df = _docs()
    want = None
    for blocks, parts in ((1, 4), (9, 2), (9, 13)):
        ds = ray.data.from_pandas([d for _, d in
                                   df.groupby(df.index % blocks)]) \
            if blocks > 1 else ray.data.from_pandas(df)
        out = stratified_sample(ds, key_cols=["lang", "source"],
                                id_col="doc_id", n=7, seed=3,
                                num_partitions=parts).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        if want is None:
            want = out
        else:
            pd.testing.assert_frame_equal(want, out)
    sizes = want.groupby(["lang", "source"]).size()
    group_sizes = df.groupby(["lang", "source"]).size()
    for key, n_got in sizes.items():
        assert n_got == min(7, group_sizes[key])
    # exactly the 7 lowest-hash ids per group
    df2 = df.copy()
    df2["h"] = sample_hash(df2["doc_id"].to_numpy(), 3)
    expect = df2.sort_values(["h", "doc_id"]) \
        .groupby(["lang", "source"]).head(7)
    assert set(expect["doc_id"]) == set(want["doc_id"])


def test_stratified_small_groups_pass_through(ray_session):
    import ray.data

    df = _docs(n=20)
    out = stratified_sample(ray.data.from_pandas(df),
                            key_cols=["lang"], id_col="doc_id",
                            n=1000, seed=0).to_pandas()
    assert sorted(out["doc_id"]) == sorted(df["doc_id"])
    assert sorted(out.columns) == sorted(df.columns)  # helper col dropped


def test_bernoulli_fraction_one_is_identity(ray_session):
    import ray.data

    df = _docs(50)
    out = bernoulli_sample(ray.data.from_pandas(df), id_col="doc_id",
                           fraction=1.0).to_pandas()
    assert sorted(out["doc_id"]) == sorted(df["doc_id"])


def test_sampling_validation(ray_session):
    import ray.data

    ds = ray.data.from_pandas(_docs(10))
    with pytest.raises(ValueError, match="fraction"):
        bernoulli_sample(ds, id_col="doc_id", fraction=1.5)
    with pytest.raises(ValueError, match="positive"):
        stratified_sample(ds, key_cols=["lang"], id_col="doc_id", n=0)
