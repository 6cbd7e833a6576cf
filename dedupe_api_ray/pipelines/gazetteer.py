"""Gazetteer mode: match a query stream against an indexed canonical
set, top-n per query (J5/A3/G4 †, dedupe:dedupe/api.py::Gazetteer.
index/search and clustering.py::gazetteMatching).

Ray shape: the canonical set (the small side) is broadcast once via
``ray.put``; an actor pool holds the token index and probes each query
batch — a broadcast semi-join, no shuffle.  The final grouped top-n is
exact because each query is scored against every canonical candidate
it shares a key with (here: full scan for the oracle-checkable
variant; canopy/LSH prefilter is the documented scale path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from dedupe_api_ray.functions.text import TOKEN_RE
from dedupe_api_ray.utils import actor_pool, round_half_away


class JaccardGazetteer:
    """A3 †: canonical-set token INVERTED INDEX held per actor; per
    query, candidate canon rows are generated from the postings of the
    query's tokens and their intersection sizes fall straight out of a
    bincount over the concatenated postings — O(sum of probed postings)
    per query instead of a full O(C) scan.  The candidate set (canon
    rows sharing >= 1 token) is exactly the set with Jaccard > 0, so
    results are identical to the scan."""

    def __init__(self, canon_ref, threshold: float):
        tbl = ray.get(canon_ref)
        self.canon_ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        sets = [frozenset(TOKEN_RE.findall((t or "").lower()))
                for t in tbl["text"].to_pylist()]
        self.set_sizes = np.array([len(s) for s in sets], dtype=np.int64)
        postings: dict[str, list[int]] = {}
        for idx, s in enumerate(sets):
            for tok in s:
                postings.setdefault(tok, []).append(idx)
        self.postings = {t: np.asarray(v, dtype=np.int64)
                         for t, v in postings.items()}
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_c, out_s = [], [], []
        qids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        for qid, text in zip(qids, texts):
            qs = set(TOKEN_RE.findall((text or "").lower()))
            if not qs:
                continue
            plists = [self.postings[t] for t in qs if t in self.postings]
            if not plists:
                continue
            cand = np.concatenate(plists)
            idxs, inter = np.unique(cand, return_counts=True)
            union = len(qs) + self.set_sizes[idxs] - inter
            sim = inter / union
            keep = sim >= self.threshold
            for j in np.nonzero(keep)[0]:
                cid = int(self.canon_ids[idxs[j]])
                if cid == qid:
                    continue
                out_q.append(qid)
                out_c.append(cid)
                out_s.append(float(round_half_away(sim[j])))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "canon_id": pa.array(out_c, pa.int64()),
                         "jaccard": pa.array(out_s, pa.float64())})


def _topn(n: int):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        # deterministic: similarity desc, canon_id asc
        return g.sort_values(["jaccard", "canon_id"],
                             ascending=[False, True]).head(n) \
            .reset_index(drop=True)
    return fn


def gazetteer_topn(queries: ray.data.Dataset, canon: ray.data.Dataset,
                   n: int = 2, threshold: float = 0.0,
                   id_col: str = "doc_id", text_col: str = "text",
                   canon_max_rows: int = 2_000_000,
                   canon_max_bytes: int = 1 << 30,
                   mode: str = "auto",
                   lsh_num_perm: int = 64,
                   lsh_bands: int = 32) -> ray.data.Dataset:
    """G4 †: per query, the n best canon matches above threshold.
    Output (query_id, canon_id, jaccard).

    ``mode``:
    - "broadcast": the canonical set is broadcast (one ``ray.put``, an
      inverted token index per actor) — exact, correct only while it
      is the small side.  A canon set above ``canon_max_rows``/
      ``canon_max_bytes`` fails loudly (the canopy driver_max pattern)
      instead of silently building a multi-GiB index in every actor.
    - "lsh": the SCALE path — MinHash-LSH blocking between queries and
      canon (same permutations both sides, shuffle join on band keys,
      no broadcast of either side) → exact token-set Jaccard verify →
      per-query top-n.  Approximate only in RECALL of low-jaccard
      candidates (an LSH property); with enough bands the top-n is
      identical to the broadcast scan (tested).
    - "auto": broadcast while the canon side is small, else lsh."""
    if mode not in ("auto", "broadcast", "lsh"):
        raise ValueError(f"unknown gazetteer mode: {mode!r}")
    from dedupe_api_ray.utils import should_broadcast
    if mode == "auto":
        mode = ("broadcast" if should_broadcast(
            canon, canon_max_rows, canon_max_bytes) else "lsh")
    if mode == "lsh":
        return _gazetteer_topn_lsh(queries, canon, n, threshold,
                                   id_col, text_col,
                                   num_perm=lsh_num_perm, bands=lsh_bands)
    if not should_broadcast(canon, canon_max_rows, canon_max_bytes):
        raise RuntimeError(
            f"gazetteer_topn: canonical set exceeds the broadcast bound "
            f"(rows>{canon_max_rows} or bytes>{canon_max_bytes}); use "
            "mode='lsh' (MinHash-LSH blocking + exact Jaccard verify, "
            "no broadcast) for a large canon side")
    canon_tbl = pa.concat_tables(list(
        canon.map_batches(
            lambda t: pa.table({"doc_id": t[id_col], "text": t[text_col]}),
            batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=65536)))
    canon_ref = ray.put(canon_tbl)
    matches = queries.map_batches(
        JaccardGazetteer,
        fn_constructor_kwargs=dict(canon_ref=canon_ref, threshold=threshold),
        batch_format="pyarrow", concurrency=actor_pool(), num_cpus=1)
    return matches.groupby("query_id").map_groups(_topn(n),
                                                  batch_format="pandas")


def _gazetteer_topn_lsh(queries: ray.data.Dataset, canon: ray.data.Dataset,
                        n: int, threshold: float,
                        id_col: str, text_col: str,
                        num_perm: int = 64, bands: int = 32
                        ) -> ray.data.Dataset:
    """Sharded gazetteer: MinHash band keys on BOTH sides (same
    permutations), bipartite candidate join on the band key, exact
    token-set Jaccard verify through the size-routed payload path,
    grouped top-n.  Neither side is ever broadcast whole; every step
    is a shuffle-shaped Ray Data op, so it holds at canon sets far
    past the broadcast bound.

    The two id spaces may overlap (gazetteer queries often ARE corpus
    rows), so sides are folded into a disjoint synthetic id
    uid = 2*id + side before the union, and unfolded after."""
    from dedupe_api_ray.extras.dedup import (jaccard_verify_pairs,
                                             minhash_band_rows)
    from dedupe_api_ray.utils import default_num_partitions

    def fold(side: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({
                "doc_id": pa.array(ids * 2 + side, pa.int64()),
                "text": t[text_col]})
        return fn

    q = queries.map_batches(fold(0), batch_format="pyarrow")
    c = canon.map_batches(fold(1), batch_format="pyarrow")
    union = q.union(c)
    # materialize the band rows (narrow: int64 key + int64 uid per
    # (doc, band) — far smaller than the corpus text): both join sides
    # consume them, and pinning them keeps the MinHasher actor pools
    # from running CONCURRENTLY with the join's aggregator actors —
    # on a small session (pool minimums + one aggregator per join
    # partition) that interleaving can starve the producers outright.
    band_rows = minhash_band_rows(union, num_perm=num_perm, bands=bands,
                                  text_col="text", id_col="doc_id") \
        .materialize()

    # bipartite candidates: query-side band rows join canon-side band
    # rows on the band key (a hash-partitioned shuffle join, not a
    # broadcast).  side = uid parity.
    def split(side: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            keep = (ids % 2) == side
            tt = t.filter(pa.array(keep))
            return pa.table({"band_key": tt["band_key"],
                             f"uid_{side}": tt["doc_id"]})
        return fn

    qb = band_rows.map_batches(split(0), batch_format="pyarrow")
    cb = band_rows.map_batches(split(1), batch_format="pyarrow")
    # default_num_partitions, NOT shuffle_partitions: Dataset.join
    # reserves an aggregator actor per partition wave, and asking for
    # more partitions than CPUs-minus-reserve deadlocks a small session
    joined = qb.join(cb, join_type="inner",
                     num_partitions=default_num_partitions(),
                     on=("band_key",))

    def mk_pairs(t: pa.Table) -> pa.Table:
        a = t["uid_0"].to_numpy(zero_copy_only=False)
        b = t["uid_1"].to_numpy(zero_copy_only=False)
        keep = (a // 2) != (b // 2)  # a query never matches itself
        return pa.table({"id_a": pa.array(np.minimum(a, b)[keep]),
                         "id_b": pa.array(np.maximum(a, b)[keep])})

    from dedupe_api_ray.stages.blocking import distinct_pairs
    cands = distinct_pairs(joined.map_batches(mk_pairs,
                                              batch_format="pyarrow"))
    verified = jaccard_verify_pairs(cands, union,
                                    threshold=max(threshold, 1e-12),
                                    text_col="text", id_col="doc_id")

    def unfold(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        qid = np.where(a % 2 == 0, a, b) // 2
        cid = np.where(a % 2 == 0, b, a) // 2
        return pa.table({"query_id": pa.array(qid, pa.int64()),
                         "canon_id": pa.array(cid, pa.int64()),
                         "jaccard": t["jaccard"]})

    matches = verified.map_batches(unfold, batch_format="pyarrow")
    return matches.groupby("query_id").map_groups(_topn(n),
                                                  batch_format="pandas")
