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


class JaccardGazetteer:
    """A3 †: canonical-set token index held per actor; per query batch
    computes token-set Jaccard against the canon set and emits rows
    above ``threshold``."""

    def __init__(self, canon_ref, threshold: float):
        tbl = ray.get(canon_ref)
        self.canon_ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        self.canon_sets = [frozenset(TOKEN_RE.findall((t or "").lower()))
                           for t in tbl["text"].to_pylist()]
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_c, out_s = [], [], []
        qids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        for qid, text in zip(qids, texts):
            qs = set(TOKEN_RE.findall((text or "").lower()))
            if not qs:
                continue
            for cid, cs in zip(self.canon_ids, self.canon_sets):
                if cid == qid:
                    continue
                inter = len(qs & cs)
                if not inter:
                    continue
                union = len(qs) + len(cs) - inter
                sim = inter / union
                if sim >= self.threshold:
                    out_q.append(qid)
                    out_c.append(int(cid))
                    out_s.append(round(sim, 6))
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
                   id_col: str = "doc_id", text_col: str = "text"
                   ) -> ray.data.Dataset:
    """G4 †: per query, the n best canon matches above threshold.
    Output (query_id, canon_id, jaccard)."""
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
