"""Per-predicate blocking audit at corpus scale.

Reference parity (†): dedupe's BlockLearner costs candidate
predicates by estimated blocked pairs on a driver-side SAMPLE
(dedupe:dedupe/training.py::BlockLearner) — which systematically
under-costs fixed-cardinality predicates: a url_host key looks like
singleton blocks in a 1k-record sample and goes quadratic at 10^6
docs (measured on this engine: 2x docs → 3.1x candidate pairs at
950k pages, BENCH/BASELINE.md, "the operative control is learning
predicates whose key cardinality scales with the corpus").

``audit_predicates`` runs a candidate predicate union over the REAL
corpus — one combiner-first count shuffle, nothing driver-side except
the per-predicate summary (one row per predicate) — and returns, per
predicate: distinct keys, blocking-map rows, exact sum-of-C(n,2)
candidate pairs, and the hottest key size.  Feed the result to
``learn_predicates(key_stats=...)`` (via ``key_stats_of``) so the
greedy cover uses corpus-scale costs instead of sample
extrapolations; or run it on a trained model's predicates to see
where the pair volume of an existing pipeline comes from.

Ray shape: fingerprint actor pool → per-batch partial key counts →
``groupby(block_key)`` count shuffle → per-batch per-predicate
partials → tiny final aggregate (rows == number of predicates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Sum

from dedupe_api_ray.model import (FieldDef, Model, PredicateSpec,
                                  candidate_simple_predicates)

__all__ = ["audit_predicates", "key_stats_of",
           "candidate_simple_predicates"]


def audit_predicates(records: ray.data.Dataset,
                     specs: list[PredicateSpec],
                     field_defs: list[FieldDef],
                     id_col: str = "record_id") -> pa.Table:
    """Exact per-predicate blocking stats over ``records``.

    Returns one row per predicate (index-aligned with ``specs``):
    ``pred_index, predicate, n_keys, n_rows, max_key_rows,
    est_pairs`` where est_pairs = Σ_keys C(count, 2) — the exact
    number of within-block candidate pairs this predicate alone would
    emit (before the cross-predicate distinct).
    """
    from dedupe_api_ray.stages.blocking import (fingerprint_records,
                                                prepare_records)
    from dedupe_api_ray.utils import default_num_partitions

    if id_col != "record_id":
        records = records.rename_columns({id_col: "record_id"})
    # normalize + tokenize first, so audited keys are EXACTLY the keys
    # the partition pipeline fingerprints (prepare_records is its
    # first stage too)
    records = prepare_records(records, field_defs)
    probe = Model(field_defs=list(field_defs), predicates=list(specs),
                  weights=np.zeros(0), bias=0.0)
    bm = fingerprint_records(records, probe)

    # combiner before the shuffle: ship (key, cnt) partials, not rows
    def local_counts(t: pa.Table) -> pa.Table:
        g = t.group_by("block_key").aggregate([("record_id", "count")])
        return pa.table({"block_key": g["block_key"],
                         "cnt": g["record_id_count"]})

    counts = bm.map_batches(local_counts, batch_format="pyarrow") \
        .groupby("block_key", num_partitions=default_num_partitions(None)) \
        .aggregate(Sum("cnt", alias_name="cnt"))

    # per-batch per-predicate partials: the only thing that crosses
    # the second (tiny) shuffle is one row per (predicate, batch)
    def per_pred(t: pa.Table) -> pa.Table:
        keys = t["block_key"].to_pandas()
        idx = keys.str.split(":", n=1).str[0].astype(np.int64)
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = pd.DataFrame({"pred_index": idx.to_numpy(),
                           "n_keys": np.int64(1),
                           "n_rows": c.astype(np.int64),
                           "max_key_rows": c.astype(np.int64),
                           "est_pairs": c * (c - 1.0) / 2.0})
        g = df.groupby("pred_index", as_index=False).agg(
            n_keys=("n_keys", "sum"), n_rows=("n_rows", "sum"),
            max_key_rows=("max_key_rows", "max"),
            est_pairs=("est_pairs", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = counts.map_batches(per_pred, batch_format="pyarrow") \
        .groupby("pred_index") \
        .aggregate(Sum("n_keys", alias_name="n_keys"),
                   Sum("n_rows", alias_name="n_rows"),
                   Max("max_key_rows", alias_name="max_key_rows"),
                   Sum("est_pairs", alias_name="est_pairs")) \
        .to_pandas()  # bounded: one row per predicate

    # index-align with specs; a predicate emitting zero keys still
    # gets a row (all zeros) so callers can cost every candidate
    agg = agg.set_index("pred_index").reindex(range(len(specs))) \
        .fillna(0).reset_index()
    return pa.table({
        "pred_index": pa.array(agg["pred_index"].astype(np.int64)),
        "predicate": pa.array([s.pred_id for s in specs], pa.string()),
        "n_keys": pa.array(agg["n_keys"].astype(np.int64)),
        "n_rows": pa.array(agg["n_rows"].astype(np.int64)),
        "max_key_rows": pa.array(agg["max_key_rows"].astype(np.int64)),
        "est_pairs": pa.array(agg["est_pairs"].astype(np.float64)),
    })


def key_stats_of(audit: pa.Table) -> dict[str, float]:
    """audit_predicates output → the ``key_stats`` mapping
    (pred_id → corpus-scale candidate pairs) that
    ``learn_predicates`` / ``train_model`` accept."""
    return dict(zip(audit["predicate"].to_pylist(),
                    audit["est_pairs"].to_pylist()))
