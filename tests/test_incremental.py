"""Incremental partition (pipelines/incremental.py): a new increment
folds into existing clusters via model-scored recordlink; only the
unmatched remainder is partitioned among itself."""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from dedupe_api_ray.model import FieldDef, Model, PredicateSpec


def _model() -> Model:
    # same shape as the driver documents model: sigmoid(10*cosine +
    # 1*source_eq - 8), firstToken blocking
    return Model(
        field_defs=[FieldDef("text", "Text"), FieldDef("source", "Exact")],
        predicates=[PredicateSpec("simple", "text", "firstTokenPredicate")],
        weights=np.array([10.0, 1.0]), bias=-8.0, idf={})


def _canon() -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table({
        "cluster_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon",
                          "zeta eta theta iota kappa"]),
        "source": pa.array(["src0", "src0"]),
    }))


def _new() -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table({
        "record_id": pa.array([100, 101, 102, 103, 104], pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta zeta",   # near-dup of cluster 1
            "zeta eta theta iota kappa",     # exact text of cluster 2
            "nu xi omicron pi rho",          # novel dup pair...
            "nu xi omicron pi rho",          # ...lands in a new cluster
            "sigma tau upsilon phi chi",     # novel singleton
        ]),
        "source": pa.array(["src0"] * 5),
    }))


def test_incremental_assign_matches_and_thresholds(ray_session):
    from dedupe_api_ray.pipelines.incremental import incremental_assign

    out = incremental_assign(_new(), _canon(), _model(), threshold=0.5) \
        .to_pandas().sort_values("record_id").reset_index(drop=True)
    # only 100 and 101 share a block AND score above threshold
    assert out["record_id"].tolist() == [100, 101]
    assert out["cluster_id"].tolist() == [1, 2]
    assert (out["confidence"] >= 0.5).all()
    # exact text + equal source: sigmoid(10*1 + 1*1 - 8) = sigmoid(3)
    assert abs(out["confidence"][1] - 1 / (1 + np.exp(-3.0))) < 1e-6


def test_incremental_partition_full_map(ray_session):
    from dedupe_api_ray.pipelines.incremental import incremental_partition

    metrics = {}
    em = incremental_partition(_new(), _canon(), _model(), threshold=0.5,
                               scorer_concurrency=(1, 2), metrics=metrics) \
        .to_pandas().sort_values("record_id").reset_index(drop=True)
    got = dict(zip(em["record_id"], em["cluster_id"]))
    # matched rows keep EXISTING cluster ids; the novel dup pair forms
    # a fresh cluster labelled by its min record id; the singleton
    # stands alone — every increment record appears exactly once
    assert got == {100: 1, 101: 2, 102: 102, 103: 102, 104: 104}
    assert metrics["assigned_rows"] == 2


def test_incremental_partition_no_matches(ray_session):
    """Empty assignment: the whole increment goes through the
    remainder partition (broadcast path sees an empty id array)."""
    from dedupe_api_ray.pipelines.incremental import incremental_partition

    new = ray.data.from_arrow(pa.table({
        "record_id": pa.array([200, 201], pa.int64()),
        "text": pa.array(["foo bar baz", "foo bar baz"]),
        "source": pa.array(["src0", "src0"]),
    }))
    em = incremental_partition(new, _canon(), _model(), threshold=0.5,
                               scorer_concurrency=(1, 2)) \
        .to_pandas().sort_values("record_id").reset_index(drop=True)
    assert dict(zip(em["record_id"], em["cluster_id"])) == {200: 200,
                                                            201: 200}


def test_incremental_partition_covers_each_record_once(ray_session):
    """Partition-style invariants on a messier increment: every new
    record appears EXACTLY once; cluster labels are either an existing
    canon id or the min record id of a fresh cluster."""
    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "zeta", "eta", "theta",
             "iota", "kappa", "nu", "xi", "pi", "rho", "sigma", "tau"]
    texts, rids = [], []
    for i in range(60):
        k = rng.integers(3, 7)
        texts.append(" ".join(rng.choice(words, size=k, replace=False)))
        rids.append(1000 + i)
    new = ray.data.from_arrow(pa.table({
        "record_id": pa.array(rids, pa.int64()),
        "text": pa.array(texts),
        "source": pa.array(["src0"] * 60)}))
    from dedupe_api_ray.pipelines.incremental import incremental_partition

    em = incremental_partition(new, _canon(), _model(), threshold=0.5,
                               scorer_concurrency=(1, 2)).to_pandas()
    assert sorted(em["record_id"]) == sorted(rids)  # once each
    canon_ids = {1, 2}
    for cid, grp in em.groupby("cluster_id"):
        if cid not in canon_ids:
            assert cid == grp["record_id"].min()  # fresh = min member


def test_incremental_partition_join_path_matches_broadcast(ray_session,
                                                           monkeypatch):
    """The hash-join anti-join (scale path) must produce the same map
    as the broadcast path."""
    import pandas as pd

    import dedupe_api_ray.utils as utils
    from dedupe_api_ray.pipelines import incremental as inc

    fast = inc.incremental_partition(
        _new(), _canon(), _model(), threshold=0.5,
        scorer_concurrency=(1, 2)).to_pandas() \
        .sort_values("record_id").reset_index(drop=True)
    monkeypatch.setattr(inc, "should_broadcast", lambda *a, **k: False)
    slow = inc.incremental_partition(
        _new(), _canon(), _model(), threshold=0.5,
        scorer_concurrency=(1, 2)).to_pandas() \
        .sort_values("record_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        fast[["record_id", "cluster_id"]], slow[["record_id", "cluster_id"]])
