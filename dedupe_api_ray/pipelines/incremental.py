"""Incremental partition: fold a NEW increment of records into an
EXISTING set of entity clusters without re-clustering the whole
corpus.

Reference parity (†, SURVEY.md §2): dedupe-api serves this
interactively through its match / Gazetteer endpoints (one new record
against the trained canon set).  At 10^12 docs with a recurring crawl
the batch form is the one that matters — re-partitioning the full
corpus for every daily increment is quadratic waste; the increment
should only be blocked + scored against the existing clusters'
canonical representatives, and only the UNMATCHED remainder needs a
fresh partition() among itself.

Ray shape (every step scale-shaped, nothing driver-side):
  1. recordlink blocking between the prepared increment and the canon
     reps (fingerprint both sides, cross-side pairs only — J4);
  2. size-routed payload attach + PairScorer actor pool (A1/J3);
  3. per-new-record top-1 above threshold (groupby on the new id) —
     many-to-one by construction: any number of new records may join
     one existing cluster, and no existing cluster is ever split;
  4. anti-join the assigned ids off the increment (broadcast below the
     size bound, hash join above);
  5. partition() on the remainder only → fresh clusters (labelled by
     their min record id, disjoint from existing cluster ids as long
     as record ids are globally unique — the same contract as
     recordlink †);
  6. union of the two maps.

The known semantic gap of ANY rep-based increment (documented, not
hidden): a new record that near-matches an existing cluster only
through a NON-representative member is missed here — it lands in the
remainder and may found a new cluster.  Periodic full repartitions
bound that drift; the reference's interactive match endpoint has the
identical property since it also matches against canon reps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from dedupe_api_ray.model import Model
from dedupe_api_ray.utils import round_half_away, should_broadcast

__all__ = ["incremental_assign", "incremental_partition"]


def incremental_assign(new_records: ray.data.Dataset,
                       canon: ray.data.Dataset,
                       model: Model, threshold: float = 0.5,
                       id_col: str = "record_id",
                       canon_id_col: str = "cluster_id",
                       scorer_concurrency: int | tuple | None = None
                       ) -> ray.data.Dataset:
    """Step 1–3: (record_id, cluster_id, confidence) for every new
    record whose best canon match scores >= threshold.

    ``canon`` holds ONE representative row per existing cluster: its
    ``canon_id_col`` (the cluster label) plus the model's fields —
    e.g. ``stages.canonicalize`` output joined back to field values.
    Cluster labels and new record ids must be disjoint (cluster ids
    are min member record ids, so globally-unique record ids give
    this for free).

    Ties on the 6-dp rounded score break toward the smallest cluster
    id — rounding first keeps the argmax stable under float32 ulp
    noise (the same 6-dp contract the scored-pairs oracle pins)."""
    from dedupe_api_ray.pipelines.recordlink import recordlink_candidate_pairs
    from dedupe_api_ray.stages.blocking import prepare_records
    from dedupe_api_ray.stages.scoring import attach_payload, score_pairs

    if id_col != "record_id":
        new_records = new_records.rename_columns({id_col: "record_id"})
    canon_r = canon.rename_columns({canon_id_col: "record_id"})
    new_p = prepare_records(new_records, model.field_defs)
    canon_p = prepare_records(canon_r, model.field_defs)
    pairs = recordlink_candidate_pairs(new_p, canon_p, model)
    scored = score_pairs(
        attach_payload(pairs, new_p.union(canon_p), model),
        model, concurrency=scorer_concurrency)
    kept = scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t["score"], threshold)),
        batch_format="pyarrow")

    def best(g: pd.DataFrame) -> pd.DataFrame:
        s6 = round_half_away(g["score"].to_numpy(np.float64), 6)
        g = g.assign(__s6=s6).sort_values(
            ["__s6", "id_b"], ascending=[False, True]).head(1)
        return pd.DataFrame({
            "record_id": g["id_a"].to_numpy(np.int64),
            "cluster_id": g["id_b"].to_numpy(np.int64),
            "confidence": g["score"].to_numpy(np.float64)})

    return kept.groupby("id_a").map_groups(best, batch_format="pandas")


def incremental_partition(new_records: ray.data.Dataset,
                          canon: ray.data.Dataset,
                          model: Model, threshold: float = 0.5,
                          id_col: str = "record_id",
                          canon_id_col: str = "cluster_id",
                          metrics: dict | None = None,
                          **partition_kwargs) -> ray.data.Dataset:
    """Full increment fold: assign to existing clusters where the
    model says so, partition the remainder among itself, union the
    maps.  Extra ``partition_kwargs`` flow to ``partition()`` for the
    remainder pass (hard_cap, scorer_concurrency, ckpt_dir, ...)."""
    from dedupe_api_ray.pipelines.dedupe import partition

    if id_col != "record_id":
        new_records = new_records.rename_columns({id_col: "record_id"})
    assigned = incremental_assign(
        new_records, canon, model, threshold,
        canon_id_col=canon_id_col,
        scorer_concurrency=partition_kwargs.get("scorer_concurrency")
    ).materialize()  # consumed twice: anti-join side + output union

    # anti-join: drop assigned ids from the increment.  The assigned
    # map is 3 narrow columns (<= one row per new record); broadcast
    # its sorted id array while it is the small side, else mark via a
    # hash join (the same size routing as every small-side lookup in
    # partition()).
    if should_broadcast(assigned):
        ids = np.sort(np.concatenate(
            [b["record_id"].to_numpy(zero_copy_only=False)
             for b in assigned.iter_batches(batch_format="pyarrow",
                                            batch_size=1 << 20)]
            or [np.empty(0, np.int64)]))
        ids_ref = ray.put(ids)

        def drop_assigned(t: pa.Table) -> pa.Table:
            a = ray.get(ids_ref)
            if len(a) == 0:
                return t
            r = t["record_id"].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(a, r), 0, len(a) - 1)
            return t.filter(pa.array(a[pos] != r))

        remainder = new_records.map_batches(drop_assigned,
                                            batch_format="pyarrow")
    else:
        # scale path: Bloom-prefiltered anti join — the unassigned
        # bulk are definite bloom misses and BYPASS the shuffle, so
        # the increment's text payload never moves for them; only
        # possible hits pay the exact membership pass
        from dedupe_api_ray.stages.semi import anti_join
        remainder = anti_join(new_records, assigned,
                              left_on="record_id", prefilter="bloom")

    rest = partition(remainder, model, threshold=threshold,
                     metrics=metrics, **partition_kwargs)
    if metrics is not None:
        metrics["assigned_rows"] = assigned.count()
    return assigned.union(rest)
