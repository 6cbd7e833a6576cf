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
                     concurrency: int | tuple = (1, 8)) -> ray.data.Dataset:
    """Exact cosine top-k of every query against the corpus.
    Output: (query_id, vec_id, score) with k rows per query."""
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


def ivf_topk(embeddings: ray.data.Dataset, queries: np.ndarray,
             query_ids: np.ndarray, k: int = 5, n_centroids: int = 16,
             nprobe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding") -> ray.data.Dataset:
    """Approximate top-k: corpus rows are partitioned by nearest
    centroid; each query probes only its nprobe closest partitions.
    At cluster scale the partition assignment is written once as a
    partitioned Parquet layout and reused across query batches."""
    cent = train_centroids(embeddings, n_centroids, vec_col=vec_col)
    cent_ref = ray.put(cent)
    qn = _normalize_rows(np.asarray(queries, dtype=np.float64))
    probe_lists = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    # query set per centroid
    queries_by_cent: dict[int, list[int]] = {}
    for qi, probes in enumerate(probe_lists):
        for c in probes:
            queries_by_cent.setdefault(int(c), []).append(qi)
    plan_ref = ray.put({
        "queries_by_cent": queries_by_cent,
        "qmat": qn, "qids": np.asarray(query_ids)})

    class ProbedTopK:
        def __init__(self):
            self.cent = ray.get(cent_ref)
            plan = ray.get(plan_ref)
            self.by_cent = plan["queries_by_cent"]
            self.qmat = plan["qmat"]
            self.qids = plan["qids"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            vecs = _normalize_rows(
                np.stack(batch[vec_col].to_pylist()).astype(np.float64))
            assign = np.argmax(vecs @ self.cent.T, axis=1)
            out_q, out_v, out_s = [], [], []
            for c in np.unique(assign):
                qlist = self.by_cent.get(int(c))
                if not qlist:
                    continue
                rows = np.nonzero(assign == c)[0]
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

    partials = embeddings.map_batches(ProbedTopK, batch_format="pyarrow",
                                      concurrency=(1, 8), num_cpus=1)
    return partials.groupby("query_id").map_groups(
        _final_topk(k), batch_format="pandas")
