"""Pair scoring: payload join + stateful PairScorer actor pool.

Reference (†): dedupe:dedupe/core.py::scoreDuplicates / ScoreDupes —
multiprocessing workers pulling pair chunks from a queue, classifier +
C distance kernels loaded per worker, scores into a numpy memmap.

Ray shape (BASELINE.json north_star "stateful actor pools holding the
trained classifier and distance kernels"): the model artifact is
``ray.put`` once; each PairScorer actor unpickles it in ``__init__``;
``map_batches`` streams Arrow pair batches through the pool and emits
(id_a, id_b, score: float32).

Payload attachment (J3 — the widest shuffle in the pipeline): by
default a hash-partitioned ``Dataset.join`` of pairs against the
records table on each side; when the records table is small enough it
is broadcast (``ray.put`` once, dict lookup per batch) instead of
shuffled — the small-side-broadcast rule from SURVEY.md §2.5.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from dedupe_api_ray.model import Model


def _payload_columns(model: Model) -> list[str]:
    cols: list[str] = []
    for f in model.field_defs:
        if f.type == "Interaction":
            continue
        cols.append(f.field)
        if f.type == "Text":
            cols.append(f"{f.field}__tokens")
    # dedupe preserving order
    seen: set[str] = set()
    return [c for c in cols if not (c in seen or seen.add(c))]


def attach_payload(pairs: ray.data.Dataset, records: ray.data.Dataset,
                   model: Model, num_partitions: int | None = None,
                   broadcast_threshold: int = 2_000_000) -> ray.data.Dataset:
    """pairs (id_a, id_b) → pairs with a_<field> / b_<field> columns."""
    from dedupe_api_ray.utils import default_num_partitions
    num_partitions = default_num_partitions(num_partitions)
    cols = _payload_columns(model)
    n_records = records.count()
    if n_records <= broadcast_threshold:
        payload_tbl = pa.concat_tables(
            [b for b in records.select_columns(["record_id", *cols])
             .iter_batches(batch_format="pyarrow", batch_size=65536)]
        )
        lookup_ref = ray.put(payload_tbl)

        class AttachBroadcast:
            def __init__(self):
                tbl = ray.get(lookup_ref)
                rid = tbl["record_id"].to_numpy(zero_copy_only=False)
                order = np.argsort(rid, kind="stable")
                self.sorted_rid = rid[order]
                self.tbl = tbl.take(pa.array(order))

            def __call__(self, batch: pa.Table) -> pa.Table:
                out = {"id_a": batch["id_a"], "id_b": batch["id_b"]}
                for side in ("a", "b"):
                    ids = batch[f"id_{side}"].to_numpy(zero_copy_only=False)
                    pos = np.searchsorted(self.sorted_rid, ids)
                    take = pa.array(pos)
                    for c in cols:
                        out[f"{side}_{c}"] = self.tbl[c].take(take)
                return pa.table(out)

        return pairs.map_batches(AttachBroadcast, batch_format="pyarrow",
                                 concurrency=(1, 4), num_cpus=1)

    # large side: two hash-partitioned joins.  Arrow's hash join
    # rejects list<> payload columns, so token columns stay behind and
    # the scorer re-tokenizes per batch (DataModel falls back when a
    # __tokens column is absent).
    cols = [c for c in cols if not c.endswith("__tokens")]

    def rename(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            data = {f"id_{side}": batch["record_id"]}
            for c in cols:
                data[f"{side}_{c}"] = batch[c]
            return pa.table(data)
        return fn

    rec_a = records.select_columns(["record_id", *cols]) \
        .map_batches(rename("a"), batch_format="pyarrow")
    rec_b = records.select_columns(["record_id", *cols]) \
        .map_batches(rename("b"), batch_format="pyarrow")
    joined = pairs.join(rec_a, join_type="inner",
                        num_partitions=num_partitions, on=("id_a",))
    joined = joined.join(rec_b, join_type="inner",
                         num_partitions=num_partitions, on=("id_b",))
    return joined


class PairScorer:
    """A1 (†): classifier + distance kernels held per actor."""

    def __init__(self, model_ref):
        self.model: Model = ray.get(model_ref) if isinstance(
            model_ref, ray.ObjectRef) else model_ref
        self.dm = self.model.data_model()
        self.cols = _payload_columns(self.model)

    def __call__(self, batch: pa.Table) -> pa.Table:
        recs_a: dict[str, list] = {}
        recs_b: dict[str, list] = {}
        names = set(batch.column_names)
        for c in self.cols:
            if f"a_{c}" not in names:
                continue  # token cols absent on the join path
            recs_a[c] = batch[f"a_{c}"].to_pylist()
            recs_b[c] = batch[f"b_{c}"].to_pylist()
        x = self.dm.distances(recs_a, recs_b)
        score = self.model.predict_proba(x).astype(np.float32)
        return pa.table({
            "id_a": batch["id_a"],
            "id_b": batch["id_b"],
            "score": pa.array(score, pa.float32()),
        })


def score_pairs(pairs_with_payload: ray.data.Dataset, model: Model,
                concurrency: int | tuple = (1, 8), batch_size: int = 4096
                ) -> ray.data.Dataset:
    model_ref = ray.put(model)
    return pairs_with_payload.map_batches(
        PairScorer, fn_constructor_kwargs={"model_ref": model_ref},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
