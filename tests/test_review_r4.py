"""Round-4 review regressions:

- scale-path (post-COUNT_DRIVER_MAX) blocking metrics must be plain
  Python ints — np.int64 values crash the checkpoint manifest and the
  job CLI ``json.dump``;
- ``write_entity_map`` returns the written row count without
  re-executing the (lazy, possibly expensive) input pipeline;
- ``lsh_candidate_pairs`` forwards ``hard_cap_mode`` so the explicit
  drop behavior remains reachable.
"""

import json

import numpy as np
import pyarrow as pa

import ray
import ray.data


def test_scale_path_metrics_json_serializable(ray_session, monkeypatch):
    """The scale count path builds hot_counts from a pandas frame;
    its values must come out as Python ints so the metrics dict
    survives json.dump (checkpoint manifests, job CLI output)."""
    import dedupe_api_ray.stages.blocking as bl

    monkeypatch.setattr(bl, "COUNT_DRIVER_MAX", -1)  # force scale path
    bm = pa.table({
        "block_key": pa.array(["hot"] * 50 + ["ok"] * 3),
        "record_id": pa.array(np.arange(53, dtype=np.int64)),
    })
    for mode in ("sample", "drop"):
        metrics = {}
        bl.candidate_pairs(ray.data.from_arrow(bm), max_block_size=10,
                           hard_cap=20, hard_cap_mode=mode,
                           metrics=metrics).count()
        payload = json.dumps(metrics)  # np.int64 raises TypeError here
        assert json.loads(payload)["sampled_keys" if mode == "sample"
                                   else "dropped_keys"] == 1
        assert all(type(v) in (int, float, str, bool)
                   for v in metrics.values())


def test_write_entity_map_returns_count(ray_session, tmp_path):
    from dedupe_api_ray.sources.io import write_entity_map

    em = ray.data.from_arrow(pa.table({
        "record_id": pa.array(np.arange(17, dtype=np.int64)),
        "cluster_id": pa.array(np.zeros(17, dtype=np.int64)),
        "confidence": pa.array(np.full(17, 0.9)),
    }))
    for fmt in ("parquet", "csv", "json"):
        assert write_entity_map(em, str(tmp_path / fmt), fmt=fmt) == 17


def test_lsh_hard_cap_mode_forwarded(ray_session):
    """hard_cap_mode='drop' through lsh_candidate_pairs must drop the
    over-cap bucket (pre-r4 behavior, now explicit)."""
    from dedupe_api_ray.extras.dedup import lsh_candidate_pairs

    tbl = pa.table({
        "doc_id": pa.array(np.arange(30, dtype=np.int64)),
        "band_key": pa.array([7] * 25 + [9] * 5, pa.int64()),
    })
    metrics = {}
    pairs = lsh_candidate_pairs(ray.data.from_arrow(tbl), max_bucket=10,
                                hard_cap=20, hard_cap_mode="drop",
                                metrics=metrics)
    assert pairs.count() == 5 * 4 // 2  # only bucket 9
    assert metrics["dropped_keys"] == 1
    # default mode keeps partial coverage of the hot bucket
    m2 = {}
    sampled = lsh_candidate_pairs(ray.data.from_arrow(tbl), max_bucket=10,
                                  hard_cap=20, metrics=m2)
    assert sampled.count() > 5 * 4 // 2
    assert m2["sampled_keys"] == 1


def test_cc_distributed_raises_on_iteration_cap(ray_session):
    """An exhausted large/small-star cap must fail loudly — labelling
    a non-fixpoint edge set would silently split components."""
    import pytest

    from dedupe_api_ray.stages.clustering import (
        connected_components_distributed)

    edges = ray.data.from_arrow(pa.table({
        "u": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array([2, 3, 4], pa.int64())}))
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components_distributed(edges, max_iterations=0).count()


def test_attach_payload_missing_id_fails_loudly(ray_session):
    """A pair id absent from the records table must raise, not gather
    the next record's payload and score it plausibly."""
    import pytest

    from dedupe_api_ray.model import FieldDef, Model, PredicateSpec
    from dedupe_api_ray.stages.scoring import attach_payload

    model = Model(field_defs=[FieldDef("name", "String")],
                  predicates=[PredicateSpec("simple", "name",
                                            "firstTokenPredicate")],
                  weights=np.array([1.0]), bias=0.0, idf={})
    records = ray.data.from_arrow(pa.table({
        "record_id": pa.array([1, 2, 5], pa.int64()),
        "name": pa.array(["ann", "bob", "cid"])}))
    pairs = ray.data.from_arrow(pa.table({
        "id_a": pa.array([1], pa.int64()),
        "id_b": pa.array([3], pa.int64())}))  # 3 not in records
    with pytest.raises((KeyError, Exception), match="missing from"):
        attach_payload(pairs, records, model).to_pandas()


def test_scorer_payload_mode_text_without_sidecar(ray_session):
    """Fused payload mode with a Text field and NO sidecar must score
    from the gathered payload values (pre-fix: KeyError on
    batch['a_text'] in every actor)."""
    from dedupe_api_ray.model import FieldDef, Model, PredicateSpec
    from dedupe_api_ray.stages.scoring import attach_payload, score_pairs

    model = Model(field_defs=[FieldDef("text", "Text")],
                  predicates=[PredicateSpec("simple", "text",
                                            "firstTokenPredicate")],
                  weights=np.array([10.0]), bias=-8.0, idf={})
    tbl = pa.table({
        "record_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha beta gamma", "alpha beta gamma",
                          "alpha beta delta"])})
    records = ray.data.from_arrow(tbl)
    pairs = ray.data.from_arrow(pa.table({
        "id_a": pa.array([1, 1], pa.int64()),
        "id_b": pa.array([2, 3], pa.int64())}))
    payload_ref = ray.put(tbl)
    fused = score_pairs(pairs, model, payload_ref=payload_ref,
                        payload_cols=["text"], concurrency=(1, 2)) \
        .to_pandas().sort_values("id_b").reset_index(drop=True)
    attached = score_pairs(attach_payload(pairs, records, model), model,
                           concurrency=(1, 2)) \
        .to_pandas().sort_values("id_b").reset_index(drop=True)
    assert np.allclose(fused["score"], attached["score"], atol=1e-6)
    assert fused["score"][0] > fused["score"][1]  # exact dup scores higher


def test_tfidf_search_index_size_guard(ray_session):
    """An indexed side above index_max_rows fails loudly instead of
    silently broadcasting a multi-GiB postings index."""
    import pytest

    from dedupe_api_ray.blocking.canopy import tfidf_search_keys

    docs = ray.data.from_arrow(pa.table({
        "record_id": pa.array(np.arange(10), pa.int64()),
        "text": pa.array([f"tok{i} common" for i in range(10)])}))
    with pytest.raises(RuntimeError, match="index_max_rows"):
        tfidf_search_keys(docs, docs, "text", 0.5, index_max_rows=5)
