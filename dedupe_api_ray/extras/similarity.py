"""Similarity search over an embedding column (list<float>).

- brute-force cosine top-k: per-batch numpy matmul against a broadcast
  query matrix (``ray.put`` once, read per actor), partial top-k per
  batch, final exact top-k in a small grouped reduce — never
  materializes the corpus on the driver.
- IVF variant (scale path): k-means-lite coarse centroids (trained on
  a sample, broadcast), each batch assigns rows to nearest centroid →
  probe only the query's nprobe closest centroid partitions.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from dedupe_api_ray.utils import actor_pool


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteForceTopK:
    """map_batches stage: emits the per-batch top-k candidates for
    every query; exact global top-k falls out of a later grouped
    reduce over these partials (associative top-k)."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(queries_ref)
        self.qids = q["query_id"]
        self.qmat = _normalize_rows(q["matrix"])
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        vecs = np.stack(batch[self.vec_col].to_pylist()).astype(np.float64)
        vn = _normalize_rows(vecs)
        sim = self.qmat @ vn.T  # (n_queries, batch)
        k = min(self.k, sim.shape[1])
        idx = np.argpartition(-sim, k - 1, axis=1)[:, :k]
        out_q, out_v, out_s = [], [], []
        for qi in range(sim.shape[0]):
            for j in idx[qi]:
                out_q.append(int(self.qids[qi]))
                out_v.append(int(ids[j]))
                out_s.append(float(sim[qi, j]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})


def _final_topk(k: int):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        # deterministic: score desc, then vec_id asc
        g = g.sort_values(["score", "vec_id"],
                          ascending=[False, True]).head(k)
        return g.reset_index(drop=True)
    return fn


def brute_force_topk(embeddings: ray.data.Dataset, queries: np.ndarray,
                     query_ids: np.ndarray, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     concurrency: int | tuple | None = None
                     ) -> ray.data.Dataset:
    """Exact cosine top-k of every query against the corpus.
    Output: (query_id, vec_id, score) with k rows per query."""
    if concurrency is None:
        concurrency = actor_pool()
    queries_ref = ray.put({"query_id": np.asarray(query_ids),
                           "matrix": np.asarray(queries, dtype=np.float64)})
    partials = embeddings.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs=dict(queries_ref=queries_ref, k=k,
                                   id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1)
    return partials.groupby("query_id").map_groups(
        _final_topk(k), batch_format="pandas")


# ---------------------------------------------------------------------------
# IVF (coarse-quantized) variant — the documented scale path
# ---------------------------------------------------------------------------


def train_centroids(embeddings: ray.data.Dataset, n_centroids: int = 16,
                    sample_rows: int = 4096, iters: int = 10,
                    vec_col: str = "embedding", seed: int = 42) -> np.ndarray:
    """k-means on a driver-side RANDOM sample (Lloyd, fixed seed).  The
    centroid matrix is tiny and gets broadcast.

    A `limit(sample_rows)` here would take the FIRST rows, which on
    sorted/clustered input biases the centroids; `random_sample` keeps
    the sample representative regardless of input layout."""
    n = embeddings.count()
    if n > sample_rows:
        frac = min(1.0, (sample_rows * 1.3) / n)
        sample = (embeddings.select_columns([vec_col])
                  .random_sample(frac, seed=seed)
                  .limit(sample_rows).to_pandas())
        if len(sample) < min(n_centroids, n):  # unlucky tiny sample
            sample = embeddings.select_columns([vec_col]) \
                .limit(sample_rows).to_pandas()
    else:
        sample = embeddings.select_columns([vec_col]).to_pandas()
    x = _normalize_rows(np.stack(sample[vec_col].to_list()).astype(np.float64))
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize_rows(cent)
    return cent


def ivf_build_index(embeddings: ray.data.Dataset, index_dir: str,
                    n_centroids: int = 16, vec_col: str = "embedding",
                    seed: int = 42) -> np.ndarray:
    """Materialize the IVF layout ONCE: train centroids, assign every
    row to its nearest centroid, and write the corpus as Parquet
    partitioned by ``__cent`` (one directory per centroid).  Queries
    then read ONLY their probed partitions — the partition pruning
    that makes IVF cheaper than brute force at scale.  Returns the
    centroid matrix (also persisted to ``<index_dir>/_centroids.npy``
    so later sessions can query without retraining)."""
    import os

    cent = train_centroids(embeddings, n_centroids, vec_col=vec_col,
                           seed=seed)
    cent_ref = ray.put(cent)

    class AssignCentroid:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize_rows(
                np.stack(batch[vec_col].to_pylist()).astype(np.float64))
            assign = np.argmax(vecs @ self.cent.T, axis=1)
            return batch.append_column(
                "__cent", pa.array(assign.astype(np.int64)))

    embeddings.map_batches(AssignCentroid, batch_format="pyarrow",
                           concurrency=actor_pool(), num_cpus=1) \
        .write_parquet(index_dir, partition_cols=["__cent"])
    np.save(os.path.join(index_dir, "_centroids.npy"), cent)
    return cent


def ivf_topk_indexed(index_dir: str, queries: np.ndarray,
                     query_ids: np.ndarray, k: int = 5, nprobe: int = 4,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     metrics: dict | None = None) -> ray.data.Dataset:
    """Query a materialized IVF index: only the union of the queries'
    nprobe closest centroid partitions is READ (directory-level
    pruning — unprobed partitions never leave storage), each probed
    batch is scored only against the queries that probed its
    centroid, and the exact per-query top-k falls out of the same
    grouped reduce as brute force.  ``metrics`` receives
    probed_partitions / total_partitions."""
    import os

    cent = np.load(os.path.join(index_dir, "_centroids.npy"))
    qn = _normalize_rows(np.asarray(queries, dtype=np.float64))
    probe_lists = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    queries_by_cent: dict[int, list[int]] = {}
    for qi, probes in enumerate(probe_lists):
        for c in probes:
            queries_by_cent.setdefault(int(c), []).append(qi)
    plan_ref = ray.put({"queries_by_cent": queries_by_cent,
                        "qmat": qn, "qids": np.asarray(query_ids)})

    class ProbedTopK:
        """Scores a probed batch against exactly the queries that
        probed its ``__cent`` value (no assignment recompute — the
        partition IS the assignment)."""

        def __init__(self):
            plan = ray.get(plan_ref)
            self.by_cent = plan["queries_by_cent"]
            self.qmat = plan["qmat"]
            self.qids = plan["qids"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            vecs = _normalize_rows(
                np.stack(batch[vec_col].to_pylist()).astype(np.float64))
            cents = batch["__cent"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            out_q, out_v, out_s = [], [], []
            for c in np.unique(cents):
                qlist = self.by_cent.get(int(c))
                if not qlist:
                    continue
                rows = np.nonzero(cents == c)[0]
                sim = self.qmat[qlist] @ vecs[rows].T
                kk = min(k, sim.shape[1])
                idx = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
                for qi_local, qi in enumerate(qlist):
                    for j in idx[qi_local]:
                        out_q.append(int(self.qids[qi]))
                        out_v.append(int(ids[rows[j]]))
                        out_s.append(float(sim[qi_local, j]))
            return pa.table({"query_id": pa.array(out_q, pa.int64()),
                             "vec_id": pa.array(out_v, pa.int64()),
                             "score": pa.array(out_s, pa.float64())})

    all_parts = sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(index_dir)
        if d.startswith("__cent="))
    probed = [c for c in all_parts if c in queries_by_cent]
    if metrics is not None:
        metrics["probed_partitions"] = len(probed)
        metrics["total_partitions"] = len(all_parts)
    if not probed:
        return ray.data.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64())}))
    parts = []
    for c in probed:
        # per-directory read, centroid re-tagged as int64 from the
        # path (Ray may or may not surface the hive value, and as a
        # string when it does) — unprobed directories are never opened
        def _tag(t: pa.Table, _c=c) -> pa.Table:
            if "__cent" in t.column_names:
                t = t.drop_columns(["__cent"])
            return t.append_column(
                "__cent", pa.array(np.full(len(t), _c, np.int64)))

        parts.append(
            ray.data.read_parquet(os.path.join(index_dir, f"__cent={c}"))
            .map_batches(_tag, batch_format="pyarrow"))
    ds = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    partials = ds.map_batches(ProbedTopK, batch_format="pyarrow",
                              concurrency=actor_pool(), num_cpus=1)
    return partials.groupby("query_id").map_groups(
        _final_topk(k), batch_format="pandas")


def ivf_topk(embeddings: ray.data.Dataset, queries: np.ndarray,
             query_ids: np.ndarray, k: int = 5, n_centroids: int = 16,
             nprobe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", index_dir: str | None = None,
             metrics: dict | None = None) -> ray.data.Dataset:
    """Approximate top-k via a materialized IVF layout: builds (or
    reuses) the partitioned index, then probes only each query's
    nprobe closest centroid partitions (ivf_topk_indexed).  Pass
    ``index_dir`` to persist/reuse the layout across query batches —
    the scale path; without it a throwaway index is built under /tmp
    for this call."""
    import os
    import tempfile

    ephemeral = index_dir is None
    if ephemeral:
        index_dir = tempfile.mkdtemp(prefix="ivf_index_")
    if not os.path.exists(os.path.join(index_dir, "_centroids.npy")):
        ivf_build_index(embeddings, index_dir, n_centroids,
                        vec_col=vec_col)
    try:
        return ivf_topk_indexed(index_dir, queries, query_ids, k=k,
                                nprobe=nprobe, id_col=id_col,
                                vec_col=vec_col, metrics=metrics)
    finally:
        if ephemeral:
            # results are lazy over the index files: defer cleanup to
            # process exit, do not delete under a streaming read
            import atexit
            import shutil
            atexit.register(shutil.rmtree, index_dir, ignore_errors=True)


# ---------------------------------------------------------------------------
# Distributed k-means (full-corpus Lloyd) — unlike train_centroids
# (driver-side sample for IVF), every iteration streams the WHOLE
# corpus: assignment + per-cluster partial sums inside map_batches,
# then a k*d-row groupby. SQL-replayable by construction.
# ---------------------------------------------------------------------------


class _KMeansAssign:
    """Actor stage: assign each vector to its nearest centroid
    (Euclidean, distance rounded half-away at ``dist_dp`` so ulp noise
    cannot flip an argmin — ties then break on the LOWEST cluster id,
    the same total order the SQL oracle's row_number ORDER BY uses)."""

    def __init__(self, cent_ref, vec_col: str, id_col: str,
                 dist_dp: int, emit: str):
        from dedupe_api_ray.utils import round_half_away
        self._round = round_half_away
        self.cent = ray.get(cent_ref)  # (k, d) float64
        self.vec_col, self.id_col = vec_col, id_col
        self.dist_dp, self.emit = dist_dp, emit

    def _assign(self, vecs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        d2 = ((vecs[:, None, :] - self.cent[None, :, :]) ** 2).sum(-1)
        dist = self._round(np.sqrt(d2), self.dist_dp)
        a = np.argmin(dist, axis=1)  # first min → lowest cid on ties
        return a, dist[np.arange(len(a)), a]

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch[self.vec_col].to_pylist()) \
            .astype(np.float64)
        a, dist = self._assign(vecs)
        if self.emit == "assignments":
            return pa.table({
                self.id_col: batch[self.id_col],
                "cluster_id": pa.array(a.astype(np.int64)),
                "dist": pa.array(self._round(dist, 6), pa.float64())})
        # partial sums: (cid, dim, s, n) — k*d rows per batch, so the
        # shuffle moves centroids' worth of data, never vectors'
        k, d = self.cent.shape
        sums = np.zeros((k, d), dtype=np.float64)
        np.add.at(sums, a, vecs)
        n = np.bincount(a, minlength=k).astype(np.int64)
        return pa.table({
            "cid": pa.array(np.repeat(np.arange(k, dtype=np.int64), d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
            "s": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(n, d))})


def kmeans_fit(embeddings: ray.data.Dataset, *, k: int = 4,
               iters: int = 3, vec_col: str = "embedding",
               id_col: str = "vec_id", cent_dp: int = 6,
               dist_dp: int = 9
               ) -> tuple[np.ndarray, ray.data.Dataset]:
    """Full-corpus Lloyd k-means.  Returns (centroids, assignments) —
    assignments is a Dataset of (id_col, cluster_id, dist).

    Determinism + oracle parity (every quantity is replayable in SQL):
    - init = the k vectors with the SMALLEST ids (cid by id order),
      UNROUNDED — both sides read the identical doubles from storage,
      so rounding here would only create a divergence (the SQL c0 CTE
      casts the raw embedding);
    - assignment = argmin of Euclidean distance rounded half-away at
      ``dist_dp``; ties break on lowest cid;
    - update = per-dimension mean rounded half-away at ``cent_dp``
      (rounding absorbs the float-summation-order difference between
      the engine's partial sums and SQL's avg());
    - an empty cluster keeps its previous centroid.

    Scale shape: centroids broadcast via ``ray.put`` (k*d doubles);
    each iteration is ONE streaming pass — assignment and per-cluster
    partial sums fused in an actor pool, then a groupby over k*d
    partial rows (centroid-sized, never corpus-sized); means assemble
    driver-side from k*d aggregated rows.  iters+1 passes total."""
    from dedupe_api_ray.stages.topk import global_topk
    from dedupe_api_ray.utils import actor_pool, round_half_away
    from ray.data.aggregate import Sum

    # k smallest ids without a full sort shuffle (per-block prune)
    init = global_topk(embeddings.select_columns([id_col, vec_col]),
                       [id_col], k).to_pandas().sort_values(id_col)
    if len(init) < k:
        raise ValueError(f"kmeans_fit: k={k} but only {len(init)} rows")
    cent = np.stack(init[vec_col].to_list()).astype(np.float64)

    for _ in range(iters):
        cent_ref = ray.put(cent)
        partials = embeddings.map_batches(
            _KMeansAssign,
            fn_constructor_kwargs=dict(cent_ref=cent_ref,
                                       vec_col=vec_col, id_col=id_col,
                                       dist_dp=dist_dp, emit="partials"),
            batch_format="pyarrow", concurrency=actor_pool(), num_cpus=1)
        # num_partitions=2, NOT shuffle_partitions(): the shuffled rows
        # are per-block partial sums (<= k*d per block, k*d total after
        # the merge — never vector- or corpus-sized), so the convention
        # of 2x-CPUs partitions would only add empty-partition overhead
        agg = partials.groupby(["cid", "dim"], num_partitions=2) \
            .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        t = pa.concat_tables(list(agg.iter_batches(
            batch_format="pyarrow", batch_size=1 << 20)))  # k*d rows
        cid = t["cid"].to_numpy(zero_copy_only=False)
        dim = t["dim"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        new = cent.copy()  # empty clusters keep their centroid
        ok = n > 0
        new[cid[ok], dim[ok]] = round_half_away(s[ok] / n[ok], cent_dp)
        cent = new

    cent_ref = ray.put(cent)
    assigns = embeddings.map_batches(
        _KMeansAssign,
        fn_constructor_kwargs=dict(cent_ref=cent_ref, vec_col=vec_col,
                                   id_col=id_col, dist_dp=dist_dp,
                                   emit="assignments"),
        batch_format="pyarrow", concurrency=actor_pool(), num_cpus=1)
    return cent, assigns
