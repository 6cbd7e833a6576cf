"""Scorer-isolation scaling microbench.

Times ONLY build_tf_sidecar + score_pairs over synthetic random pairs
on the cached bench corpus, at a given CPU count — isolates the scorer
stage from blocking/CC so the scaling protocol's dominant cost can be
attributed (is the scorer compute-bound and parallel, or
memory-bandwidth/plasma-bound and flat?).

Usage: python tools/scorer_microbench.py <num_cpus> [n_pairs=20000000]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ncpu = int(sys.argv[1])
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    rec_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/bench_out_16/records"

    import ray
    import ray.data
    from ray.data import DataContext

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR", object_store_memory=12 * 1024 ** 3)
    DataContext.get_current().enable_progress_bars = False

    import bench as B
    from dedupe_api_ray.stages.scoring import (_payload_columns,
                                               build_tf_sidecar, score_pairs)

    model = B.bench_model()
    records = ray.data.read_parquet(rec_dir) \
        .drop_columns(["url", "lang", "warc_ts"]).materialize()

    t0 = time.monotonic()
    sidecar = build_tf_sidecar(records, model)
    t_sidecar = round(time.monotonic() - t0, 2)

    ids = np.sort(np.concatenate([
        b["record_id"].to_numpy()
        for b in records.select_columns(["record_id"])
        .iter_batches(batch_format="pyarrow", batch_size=1 << 20)]))
    rng = np.random.default_rng(7)
    a = rng.choice(ids, n_pairs)
    b2 = rng.choice(ids, n_pairs)
    mask = a != b2
    lo = np.minimum(a[mask], b2[mask]).astype(np.int64)
    hi = np.maximum(a[mask], b2[mask]).astype(np.int64)
    pairs = ray.data.from_arrow(
        pa.table({"id_a": pa.array(lo), "id_b": pa.array(hi)})) \
        .repartition(ncpu * 8).materialize()

    sidecar_only = {"text"}
    pay_cols = _payload_columns(model, exclude=sidecar_only)
    sel = records.select_columns(["record_id", *pay_cols])
    pay_tbl = pa.concat_tables(list(sel.iter_batches(
        batch_format="pyarrow", batch_size=65536)))

    t0 = time.monotonic()
    scored = score_pairs(pairs, model, concurrency=(ncpu, ncpu),
                         sidecar_refs=sidecar,
                         payload_ref=ray.put(pay_tbl),
                         payload_cols=pay_cols)
    n = scored.count()
    t_score = round(time.monotonic() - t0, 2)
    print(json.dumps({
        "num_cpus": ncpu, "n_pairs": int(n), "sidecar_sec": t_sidecar,
        "score_sec": t_score,
        "pairs_per_sec": round(n / t_score),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
