"""Scale-shape regression tests (round-2 fixes):

- hot LSH band buckets (>5000 members) are salted losslessly, never
  silently dropped;
- the near-dup verify join path produces byte-identical results to the
  broadcast path;
- hard_cap drops are observable via the metrics sidecar;
- latLongGridPredicate (P17) through the registry / fingerprinter;
- IVF centroid training samples randomly (sorted input no longer
  biases the sample to the first rows).
"""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data


def test_lsh_hot_bucket_salted_lossless(ray_session):
    """A band bucket with >5000 members must yield ALL C(n,2) pairs
    (round-1 silently dropped such buckets)."""
    from dedupe_api_ray.extras.dedup import lsh_candidate_pairs

    n = 5100
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "band_key": pa.array(np.full(n, 7, dtype=np.int64)),
    })
    metrics = {}
    pairs = lsh_candidate_pairs(ray.data.from_arrow(tbl), metrics=metrics)
    assert pairs.count() == n * (n - 1) // 2
    assert metrics["dropped_keys"] == 0
    assert metrics["salted_keys"] == 1


def test_candidate_pairs_hard_cap_metrics(ray_session):
    """hard_cap drops must surface in the metrics dict (never silent)."""
    from dedupe_api_ray.stages.blocking import candidate_pairs

    bm = pa.table({
        "block_key": pa.array(["hot"] * 50 + ["ok"] * 3),
        "record_id": pa.array(np.arange(53, dtype=np.int64)),
    })
    metrics = {}
    pairs = candidate_pairs(ray.data.from_arrow(bm), max_block_size=10,
                            hard_cap=20, metrics=metrics)
    assert pairs.count() == 3  # only the 'ok' block's C(3,2)
    assert metrics["dropped_keys"] == 1
    assert metrics["dropped_rows"] == 50


def test_near_dup_join_path_equals_broadcast(ray_session, tiny_corpus):
    """broadcast_threshold=0 forces the two-join payload path; results
    (incl. rounded jaccard) must match the broadcast path exactly."""
    from dedupe_api_ray.extras.dedup import near_dup_pairs_minhash
    from dedupe_api_ray.fixtures import record_id_of_url

    cols = tiny_corpus["pages"].to_pydict()
    tbl = pa.table({
        "doc_id": pa.array([record_id_of_url(u) for u in cols["url"]],
                           pa.int64()),
        "text": pa.array(cols["text"], pa.string()),
    })
    ds = ray.data.from_arrow(tbl).materialize()

    def run(bt):
        df = near_dup_pairs_minhash(ds, threshold=0.5, num_perm=32,
                                    bands=16,
                                    broadcast_threshold=bt).to_pandas()
        return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    broadcast = run(10**9)
    joined = run(0)
    assert broadcast.equals(joined)
    assert len(broadcast) > 0


def test_latlong_grid_predicate_registry(ray_session):
    """P17: 0.1-degree grid keys; registry + fingerprinter path."""
    from dedupe_api_ray.blocking.predicates import (SIMPLE_PREDICATES,
                                                    lat_long_grid)
    from dedupe_api_ray.model import (FieldDef, Model, PredicateSpec,
                                      _record_keys)
    from dedupe_api_ray.stages.blocking import fingerprint_records

    assert "latLongGridPredicate" in SIMPLE_PREDICATES
    assert lat_long_grid([41.88, -87.63]) == ("418|-877",)
    assert lat_long_grid([-0.05, 0.04]) == ("-1|0",)
    assert lat_long_grid([None, 10.0]) == ()
    assert lat_long_grid([0.0, 0.0]) == ()  # reference's any(field) guard
    assert lat_long_grid(None) == ()

    spec = PredicateSpec("simple", "loc", "latLongGridPredicate")
    assert _record_keys(spec, {"loc": [41.88, -87.63]}) == {"418|-877"}

    model = Model(field_defs=[FieldDef("loc", "LatLong")],
                  predicates=[spec], weights=np.array([1.0]), bias=0.0)
    recs = pa.table({
        "record_id": pa.array([1, 2, 3], pa.int64()),
        "loc": pa.array([[41.88, -87.63], [41.89, -87.61], [10.0, 10.0]],
                        pa.list_(pa.float64())),
    })
    bm = fingerprint_records(ray.data.from_arrow(recs), model).to_pandas()
    by_key = bm.groupby("block_key")["record_id"].apply(set).to_dict()
    assert by_key["0:418|-877"] == {1, 2}  # same 0.1-degree cell
    assert by_key["0:100|100"] == {3}


def test_train_centroids_random_sample_on_sorted_input(ray_session):
    """Sorted/clustered input: a limit()-based sample would only see
    cluster A; the random sample must land centroids in BOTH clusters."""
    from dedupe_api_ray.extras.similarity import train_centroids

    rng = np.random.RandomState(7)
    a = rng.normal(loc=0.0, scale=0.05, size=(400, 8)) + np.r_[1, np.zeros(7)]
    b = rng.normal(loc=0.0, scale=0.05, size=(400, 8)) + np.r_[-1, np.zeros(7)]
    vecs = np.vstack([a, b])  # cluster A first, then cluster B
    tbl = pa.table({"vec_id": pa.array(range(800), pa.int64()),
                    "embedding": pa.array(vecs.tolist(),
                                          pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(tbl).materialize()
    cent = train_centroids(ds, n_centroids=4, sample_rows=64, iters=5)
    # at least one centroid must be nearer B's mean than A's
    am = a.mean(axis=0) / np.linalg.norm(a.mean(axis=0))
    bm_ = b.mean(axis=0) / np.linalg.norm(b.mean(axis=0))
    near_b = ((cent @ bm_) > (cent @ am)).sum()
    assert near_b >= 1, "random sample should reach the second cluster"
    assert near_b < len(cent), "and keep the first cluster covered"
