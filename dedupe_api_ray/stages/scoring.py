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
    """Columns shipped with each pair.  Token list columns are NOT
    shipped: converting list<string> Arrow columns to Python per batch
    dominated scoring cost, and the scorer's per-record TF cache makes
    re-tokenizing on (rare) cache misses cheaper than shipping tokens
    with every pair."""
    cols: list[str] = []
    for f in model.field_defs:
        if f.type == "Interaction":
            continue
        cols.append(f.field)
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
    """A1 (†): classifier + distance kernels held per actor.

    Text-field cosine takes a cached fast path: per-record TF stats
    (counts + norm) are memoized by record id in the actor, because a
    record appears in many candidate pairs — rebuilding a Counter per
    PAIR dominated scoring cost otherwise.  Cache values are exact
    (kernels.cosine_from_stats is bit-identical to the uncached
    kernel), so scores are unchanged."""

    _CACHE_CAP = 500_000  # per-actor entries; cleared when exceeded

    def __init__(self, model_ref):
        self.model: Model = ray.get(model_ref) if isinstance(
            model_ref, ray.ObjectRef) else model_ref
        self.dm = self.model.data_model()
        self.cols = _payload_columns(self.model)
        self.text_fields = [f.field for f in self.model.field_defs
                            if f.type == "Text"]
        self._tf_cache: dict[tuple[str, int], tuple] = {}

    def _cosine_col(self, field: str, batch: pa.Table,
                    names: set[str]) -> np.ndarray:
        from dedupe_api_ray.functions.kernels import (cosine_from_stats,
                                                      tf_stats)
        from dedupe_api_ray.functions.text import tokens_of

        idf = self.model.idf.get(field)
        ids_a = batch["id_a"].to_pylist()
        ids_b = batch["id_b"].to_pylist()
        tok_a = tok_b = None
        val_a = batch[f"a_{field}"].to_pylist()
        val_b = batch[f"b_{field}"].to_pylist()
        if len(self._tf_cache) > self._CACHE_CAP:
            self._tf_cache.clear()
        cache = self._tf_cache
        n = len(ids_a)
        out = np.full(n, np.nan, dtype=np.float64)
        for i in range(n):
            stats = []
            for rid, toks, val in ((ids_a[i], tok_a, val_a),
                                   (ids_b[i], tok_b, val_b)):
                key = (field, rid)
                st = cache.get(key)
                if st is None:
                    tl = toks[i] if toks is not None else tokens_of(val[i])
                    st = tf_stats(tl, idf)
                    cache[key] = st
                stats.append(st)
            (ca, na), (cb, nb) = stats
            if not ca or not cb:
                continue  # NaN: missing side
            out[i] = cosine_from_stats(ca, na, cb, nb, idf)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        recs_a: dict[str, list] = {}
        recs_b: dict[str, list] = {}
        names = set(batch.column_names)
        for c in self.cols:
            if f"a_{c}" not in names:
                continue  # token cols absent on the join path
            recs_a[c] = batch[f"a_{c}"].to_pylist()
            recs_b[c] = batch[f"b_{c}"].to_pylist()
        precomputed = {f: self._cosine_col(f, batch, names)
                       for f in self.text_fields}
        x = self.dm.distances(recs_a, recs_b, precomputed=precomputed)
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
