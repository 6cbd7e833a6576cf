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
from dedupe_api_ray.utils import round_half_away


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
                   canon_max_bytes: int = 1 << 30) -> ray.data.Dataset:
    """G4 †: per query, the n best canon matches above threshold.
    Output (query_id, canon_id, jaccard).

    The canonical set is BROADCAST (one ``ray.put``, an inverted index
    per actor) — correct only while it is the small side.  A canon set
    above ``canon_max_rows``/``canon_max_bytes`` fails loudly (the
    canopy driver_max pattern) instead of silently building a
    multi-GiB index in every actor; the scale alternative is LSH
    blocking + jaccard_verify_pairs (extras.dedup) or the sharded
    TF-IDF search index (blocking.canopy, mode='sharded')."""
    from dedupe_api_ray.utils import should_broadcast
    if not should_broadcast(canon, canon_max_rows, canon_max_bytes):
        raise RuntimeError(
            f"gazetteer_topn: canonical set exceeds the broadcast bound "
            f"(rows>{canon_max_rows} or bytes>{canon_max_bytes}); use "
            "MinHash-LSH blocking + jaccard_verify_pairs "
            "(dedupe_api_ray.extras.dedup) or the sharded TF-IDF search "
            "index (blocking.canopy mode='sharded') for a large canon side")
    canon_tbl = pa.concat_tables(list(
        canon.map_batches(
            lambda t: pa.table({"doc_id": t[id_col], "text": t[text_col]}),
            batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=65536)))
    canon_ref = ray.put(canon_tbl)
    matches = queries.map_batches(
        JaccardGazetteer,
        fn_constructor_kwargs=dict(canon_ref=canon_ref, threshold=threshold),
        batch_format="pyarrow", concurrency=(1, 4), num_cpus=1)
    return matches.groupby("query_id").map_groups(_topn(n),
                                                  batch_format="pandas")
