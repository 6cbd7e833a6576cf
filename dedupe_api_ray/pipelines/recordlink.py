"""RecordLink mode: candidate pairs ACROSS two datasets only (J4 †,
dedupe:dedupe/api.py::RecordLink).

Ray shape: union the two sides with a ``side`` tag, run the same
fingerprinter, and emit pairs only where the sides differ — the same
blocking shuffle as Dedupe with a pair rule ``side_a != side_b``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from dedupe_api_ray.model import Model
from dedupe_api_ray.stages.blocking import fingerprint_records


def _cross_side_pairs(g: pd.DataFrame) -> pd.DataFrame:
    sides = g["side"].to_numpy()
    ids = g["record_id"].to_numpy()
    left = np.unique(ids[sides == 0])
    right = np.unique(ids[sides == 1])
    if len(left) == 0 or len(right) == 0:
        return pd.DataFrame({"id_a": [], "id_b": []}, dtype=np.int64)
    return pd.DataFrame({"id_a": np.repeat(left, len(right)),
                         "id_b": np.tile(right, len(left))})


def recordlink_candidate_pairs(ds_a: ray.data.Dataset, ds_b: ray.data.Dataset,
                               model: Model) -> ray.data.Dataset:
    """Pairs (id_a from ds_a, id_b from ds_b) sharing a block key.
    ids must be unique across BOTH datasets (reference requires the
    same †)."""
    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "side", pa.array(np.full(len(batch), side, dtype=np.int8)))
        return fn

    bm_a = fingerprint_records(ds_a, model).map_batches(
        tag(0), batch_format="pyarrow")
    bm_b = fingerprint_records(ds_b, model).map_batches(
        tag(1), batch_format="pyarrow")
    bm = bm_a.union(bm_b)
    from dedupe_api_ray.stages.blocking import distinct_pairs
    pairs = bm.groupby("block_key").map_groups(_cross_side_pairs,
                                               batch_format="pandas")
    # Materialize the BARE id pairs (two int64 columns — the smallest
    # representation this pipeline ever has) before callers stack
    # payload-attach + scorer actor pools on top.  Without the
    # barrier the streaming executor activates every operator at
    # once: two Fingerprinter pools + AttachBroadcast + PairScorer
    # each hold their min-actor CPU while the union-groupby shuffle
    # between them waits for a free slot — a hard gridlock on small
    # clusters (reproduced on a 4-CPU session via the job CLI; the
    # dedupe path avoids it because fuzzy_input materializes before
    # the pair stages and the scorer floor is half-capped).
    return distinct_pairs(pairs).materialize()
