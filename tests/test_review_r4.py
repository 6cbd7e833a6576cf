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
