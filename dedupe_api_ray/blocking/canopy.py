"""TF-IDF canopy blocking (SURVEY.md §2.3 P20/P21, M5).

Reference (†): dedupe:dedupe/predicates.py::TfidfTextCanopyPredicate /
SearchPredicate over dedupe/canopy_index.py::CanopyIndex — build a
corpus TF-IDF inverted index; canopy assignment iterates records, the
first unassigned record becomes a canopy *center* and every record
with cosine >= threshold joins its canopy; block key = center id.
Each record lands in exactly one canopy (first center to reach it).

The reference canopy is insertion-order-dependent †; we pin ascending
record_id order in both engine and oracle (SURVEY.md §2.3/§7).

Ray shapes:
- pass 1 (distributed): document-frequency counts — per-batch partial
  (token, df) rows → groupby sum; N from count(); IDF broadcast.
- pass 2 (distributed): per-record L2-normalized TF-IDF sparse vector
  (map_batches over Arrow).
- pass 3 (driver): the sequential canopy sweep itself over the
  collected sparse vectors with an inverted index — inherently
  order-dependent, exactly like the reference's in-memory
  CanopyIndex †.  Scale note: at 10^12 docs canopy is replaced by
  MinHash-LSH blocking (extras.dedup) — documented tradeoff; the
  reference's canopy is equally single-memory.
- P21 Search variant: the indexed side's vectors are broadcast to an
  actor pool; each query batch probes the inverted index and emits a
  key per indexed record within threshold (used by RecordLink /
  Gazetteer sides — a broadcast semi-join, no shuffle).
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ray.data.aggregate import Sum

from dedupe_api_ray.functions.text import TOKEN_RE


def df_counts(records: ray.data.Dataset, field: str) -> ray.data.Dataset:
    """G5: document frequency per token, pre-aggregated per batch."""
    def partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        toks_col = f"{field}__tokens"
        if toks_col in t.column_names:
            lists = t[toks_col].to_pylist()
        else:
            lists = [TOKEN_RE.findall((v or "").lower())
                     for v in t[field].to_pylist()]
        for toks in lists:
            for tok in set(toks):
                counts[tok] = counts.get(tok, 0) + 1
        return pa.table({"token": pa.array(list(counts.keys()), pa.string()),
                         "df": pa.array(list(counts.values()), pa.int64())})

    return records.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("df", alias_name="df"))


def build_idf(records: ray.data.Dataset, field: str) -> dict[str, float]:
    """IDF table: log(N / (1 + df)) + 1 (pinned engine-wide formula,
    model.compute_idf)."""
    n = records.count()
    dfs = df_counts(records, field).to_pandas()
    return {t: math.log(n / (1 + d)) + 1.0
            for t, d in zip(dfs["token"], dfs["df"])}


def _tfidf_vectors(records: ray.data.Dataset, field: str, id_col: str,
                   idf_ref) -> ray.data.Dataset:
    """(record_id, tokens[], weights[]) with L2-normalized TF-IDF."""
    def fn(t: pa.Table) -> pa.Table:
        idf = ray.get(idf_ref) if isinstance(idf_ref, ray.ObjectRef) else idf_ref
        toks_col = f"{field}__tokens"
        if toks_col in t.column_names:
            lists = t[toks_col].to_pylist()
        else:
            lists = [TOKEN_RE.findall((v or "").lower())
                     for v in t[field].to_pylist()]
        out_tok: list[list[str]] = []
        out_w: list[list[float]] = []
        for toks in lists:
            tf: dict[str, int] = {}
            for tok in toks:
                tf[tok] = tf.get(tok, 0) + 1
            items = sorted(tf.items())  # deterministic order
            ws = [f * idf.get(tok, 1.0) for tok, f in items]
            norm = math.sqrt(sum(w * w for w in ws))
            if norm > 0:
                ws = [w / norm for w in ws]
            out_tok.append([tok for tok, _ in items])
            out_w.append(ws)
        return pa.table({
            "record_id": t[id_col],
            "tokens": pa.array(out_tok, pa.list_(pa.string())),
            "weights": pa.array(out_w, pa.list_(pa.float64())),
        })

    return records.map_batches(fn, batch_format="pyarrow")


def canopy_assign(vectors: list[tuple[int, list[str], list[float]]],
                  threshold: float) -> dict[int, int]:
    """The sequential canopy sweep (reference semantics †), pinned to
    ascending record_id order.  Returns record_id → canopy center id."""
    vectors = sorted(vectors, key=lambda v: v[0])
    postings: dict[str, list[tuple[int, float]]] = defaultdict(list)
    index_of: dict[int, int] = {}
    for k, (rid, toks, ws) in enumerate(vectors):
        index_of[rid] = k
        for tok, w in zip(toks, ws):
            postings[tok].append((k, w))
    assigned: dict[int, int] = {}
    taken = np.zeros(len(vectors), dtype=bool)
    scores = np.zeros(len(vectors), dtype=np.float64)
    for k, (rid, toks, ws) in enumerate(vectors):
        if taken[k]:
            continue
        taken[k] = True
        assigned[rid] = rid  # center of its own canopy
        touched: list[int] = []
        for tok, w in zip(toks, ws):
            for other, ow in postings[tok]:
                if scores[other] == 0.0:
                    touched.append(other)
                scores[other] += w * ow
        for other in touched:
            if scores[other] >= threshold and not taken[other]:
                taken[other] = True
                assigned[vectors[other][0]] = rid
            scores[other] = 0.0
    return assigned


def tfidf_canopy_keys(records: ray.data.Dataset, field: str,
                      threshold: float, id_col: str = "record_id",
                      pred_tag: str = "canopy", mode: str = "auto",
                      driver_max_rows: int = 2_000_000,
                      num_shards: int | None = None) -> ray.data.Dataset:
    """P20 as a blocking-map fragment: (block_key, record_id) where
    block_key = '{pred_tag}:{canopy_center_id}'.

    Modes:
    - "driver" (reference semantics †): the full sequential sweep over
      all vectors, collected driver-side — bounded by a LOUD guard at
      ``driver_max_rows`` (the reference is equally single-memory).
    - "sharded" (scale path): partition-local sweeps (rid % K shards,
      ascending-rid order within each), then a driver sweep over the
      LOCAL CENTERS ONLY, merging centers within ``threshold`` —
      hierarchical canopy.  Deterministic, never collects the corpus;
      an approximation of the sequential sweep (two records can land
      in different merged canopies if their shard-local centers are
      farther apart than ``threshold``).  Guarded the same way on the
      center count; if even the centers exceed the bound the corpus
      has no canopy structure and MinHash-LSH blocking
      (extras.dedup.near_dup_pairs_minhash) is the right operator.
    - "auto": driver when count <= driver_max_rows, else sharded.
    """
    n = records.count()
    if mode == "auto":
        mode = "driver" if n <= driver_max_rows else "sharded"
    idf = build_idf(records, field)
    idf_ref = ray.put(idf)
    vecs_ds = _tfidf_vectors(records, field, id_col, idf_ref)

    if mode == "driver":
        if n > driver_max_rows:
            raise RuntimeError(
                f"tfidf_canopy mode='driver' over {n} rows exceeds "
                f"driver_max_rows={driver_max_rows}; use mode='sharded' "
                "or MinHash-LSH blocking "
                "(dedupe_api_ray.extras.dedup.near_dup_pairs_minhash)")
        vectors: list[tuple[int, list[str], list[float]]] = []
        for batch in vecs_ds.iter_batches(batch_format="pyarrow",
                                          batch_size=65536):
            vectors.extend(zip(batch["record_id"].to_pylist(),
                               batch["tokens"].to_pylist(),
                               batch["weights"].to_pylist()))
        assigned = canopy_assign(vectors, threshold)
        rids = sorted(assigned)
        return ray.data.from_arrow(pa.table({
            "block_key": pa.array([f"{pred_tag}:{assigned[r]}" for r in rids],
                                  pa.string()),
            "record_id": pa.array(rids, pa.int64()),
        }))

    # --- sharded: local sweeps → driver sweep over centers only ----------
    from dedupe_api_ray.utils import shuffle_partitions
    if num_shards is None:
        num_shards = max(2, min(shuffle_partitions(), n // 250_000 + 2))

    def add_shard(t: pa.Table) -> pa.Table:
        rid = t["record_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "shard", pa.array((rid % num_shards).astype(np.int64)))

    def local_sweep(g, _threshold=threshold):
        vectors = sorted(zip(g["record_id"].tolist(),
                             (list(x) for x in g["tokens"].tolist()),
                             (list(x) for x in g["weights"].tolist())))
        assigned = canopy_assign(vectors, _threshold)
        centers = {c for c in assigned.values()}
        vec_of = {rid: (toks, ws) for rid, toks, ws in vectors}
        rids = sorted(assigned)
        return pa.table({
            "record_id": pa.array(rids, pa.int64()),
            "local_center": pa.array([assigned[r] for r in rids], pa.int64()),
            "is_center": pa.array([r in centers for r in rids], pa.bool_()),
            "tokens": pa.array(
                [vec_of[r][0] if r in centers else [] for r in rids],
                pa.list_(pa.string())),
            "weights": pa.array(
                [vec_of[r][1] if r in centers else [] for r in rids],
                pa.list_(pa.float64())),
        })

    local = vecs_ds.map_batches(add_shard, batch_format="pyarrow") \
        .groupby("shard", num_partitions=num_shards) \
        .map_groups(local_sweep, batch_format="pandas").materialize()

    import pyarrow.compute as pc
    centers_ds = local.map_batches(
        lambda t: t.filter(pc.equal(t["is_center"], True)),
        batch_format="pyarrow")
    n_centers = centers_ds.count()
    if n_centers > driver_max_rows:
        raise RuntimeError(
            f"tfidf_canopy sharded merge: {n_centers} local centers exceed "
            f"driver_max_rows={driver_max_rows} — the corpus has no canopy "
            "structure at this threshold; use MinHash-LSH blocking "
            "(dedupe_api_ray.extras.dedup.near_dup_pairs_minhash)")
    center_vecs: list[tuple[int, list[str], list[float]]] = []
    for batch in centers_ds.select_columns(["record_id", "tokens", "weights"]) \
            .iter_batches(batch_format="pyarrow", batch_size=65536):
        center_vecs.extend(zip(batch["record_id"].to_pylist(),
                               batch["tokens"].to_pylist(),
                               batch["weights"].to_pylist()))
    center_map = canopy_assign(center_vecs, threshold)  # center → global
    map_ref = ray.put(center_map)

    def finish(t: pa.Table) -> pa.Table:
        cmap = ray.get(map_ref)
        lc = t["local_center"].to_pylist()
        return pa.table({
            "block_key": pa.array(
                [f"{pred_tag}:{cmap[c]}" for c in lc], pa.string()),
            "record_id": t["record_id"],
        })

    return local.select_columns(["record_id", "local_center"]) \
        .map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# P21: Search predicate (query side probes a broadcast index)
# ---------------------------------------------------------------------------


class TfidfSearchIndex:
    """A2 †: inverted TF-IDF index held per actor; per query batch
    emits a key per indexed record with cosine >= threshold."""

    def __init__(self, index_ref, threshold: float, field: str,
                 id_col: str, idf_ref, pred_tag: str):
        index_rows = ray.get(index_ref)
        self.idf = ray.get(idf_ref)
        self.threshold = threshold
        self.field = field
        self.id_col = id_col
        self.pred_tag = pred_tag
        self.postings: dict[str, list[tuple[int, float]]] = defaultdict(list)
        self.index_ids: list[int] = []
        for rid, toks, ws in index_rows:
            k = len(self.index_ids)
            self.index_ids.append(rid)
            for tok, w in zip(toks, ws):
                self.postings[tok].append((k, w))

    def _vector(self, toks: list[str]) -> tuple[list[str], list[float]]:
        tf: dict[str, int] = {}
        for tok in toks:
            tf[tok] = tf.get(tok, 0) + 1
        items = sorted(tf.items())
        ws = [f * self.idf.get(tok, 1.0) for tok, f in items]
        norm = math.sqrt(sum(w * w for w in ws))
        if norm > 0:
            ws = [w / norm for w in ws]
        return [tok for tok, _ in items], ws

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks_col = f"{self.field}__tokens"
        if toks_col in batch.column_names:
            lists = batch[toks_col].to_pylist()
        else:
            lists = [TOKEN_RE.findall((v or "").lower())
                     for v in batch[self.field].to_pylist()]
        qids = batch[self.id_col].to_pylist()
        n_index = len(self.index_ids)
        scores = np.zeros(n_index, dtype=np.float64)
        out_key: list[str] = []
        out_rid: list[int] = []
        for qid, toks in zip(qids, lists):
            qt, qw = self._vector(toks)
            touched: list[int] = []
            for tok, w in zip(qt, qw):
                for other, ow in self.postings.get(tok, ()):
                    if scores[other] == 0.0:
                        touched.append(other)
                    scores[other] += w * ow
            for other in touched:
                if scores[other] >= self.threshold:
                    out_key.append(f"{self.pred_tag}:{self.index_ids[other]}")
                    out_rid.append(qid)
                scores[other] = 0.0
        return pa.table({"block_key": pa.array(out_key, pa.string()),
                         "record_id": pa.array(out_rid, pa.int64())})


def tfidf_search_keys(queries: ray.data.Dataset, index: ray.data.Dataset,
                      field: str, threshold: float,
                      id_col: str = "record_id",
                      pred_tag: str = "search",
                      concurrency: int | tuple | None = None,
                      index_max_rows: int = 2_000_000) -> ray.data.Dataset:
    """P21: query-side keys — one per indexed record within threshold.
    The indexed side also emits its own-id key so both sides of a
    RecordLink share keys.

    The inverted index is BROADCAST whole (each actor holds full
    postings — the reference's search canopy is equally
    single-memory †); an indexed side above ``index_max_rows`` fails
    loudly like the canopy driver paths instead of silently building a
    multi-GiB Python index on the driver and in every actor.  For a
    large indexed side use MinHash-LSH blocking
    (extras.dedup.minhash_band_rows + lsh_candidate_pairs) or the
    gazetteer's mode='lsh', which broadcast neither side."""
    from dedupe_api_ray.utils import actor_pool
    if concurrency is None:
        concurrency = actor_pool()
    # materialize ONCE so the size guard's count() is metadata-only and
    # build_idf/_tfidf_vectors below reuse the executed blocks instead
    # of re-running the (lazy) upstream pipeline two more times
    index = index.materialize()
    n_index = index.count()
    if n_index > index_max_rows:
        raise RuntimeError(
            f"tfidf_search_keys: indexed side has {n_index} rows > "
            f"index_max_rows={index_max_rows}; the postings index is "
            "broadcast whole — use MinHash-LSH blocking or "
            "gazetteer_topn(mode='lsh') for a large indexed side")
    idf = build_idf(index, field)
    idf_ref = ray.put(idf)
    vecs = _tfidf_vectors(index, field, id_col, idf_ref)
    index_rows: list[tuple[int, list[str], list[float]]] = []
    for batch in vecs.iter_batches(batch_format="pyarrow", batch_size=65536):
        index_rows.extend(zip(batch["record_id"].to_pylist(),
                              batch["tokens"].to_pylist(),
                              batch["weights"].to_pylist()))
    index_ref = ray.put(index_rows)
    return queries.map_batches(
        TfidfSearchIndex,
        fn_constructor_kwargs=dict(index_ref=index_ref, threshold=threshold,
                                   field=field, id_col=id_col,
                                   idf_ref=idf_ref, pred_tag=pred_tag),
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1)
