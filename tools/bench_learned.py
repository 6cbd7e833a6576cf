"""End-to-end flagship partition with AUDIT-LEARNED predicates (the
answer to the 950k-page pair cliff, run as a pipeline instead of just
an audit).

Round 4 measured the pinned bench-model predicates generating 135M
candidate pairs at 940,502 pages (2x data => 3.1x pairs: url_host's
~120-key cardinality is corpus-size-independent, so its blocks go
quadratic) and showed `learn_predicates(key_stats=..., audit_fn=...,
recall_target=0.95)` dropping that predicate for an ~11.6x cheaper
union.  This tool closes the loop: audit candidates over the REAL
corpus, learn the union at corpus scale, then run the full partition
with it and record the wall next to the pinned-model wall from
BENCH/BASELINE.md.

Usage: python tools/bench_learned.py [n_entities] [num_cpus]
Writes/updates BENCH/learned_r5.json when run from the repo root.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ENTITIES = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR", object_store_memory=24 * (1 << 30))
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from audit_bench import _records

    import bench
    from dedupe_api_ray.model import (FieldDef, _normalize_record,
                                      learn_predicates)
    from dedupe_api_ray.pipelines.dedupe import partition
    from dedupe_api_ray.stages.audit import (audit_predicates,
                                             candidate_simple_predicates,
                                             key_stats_of)

    fdefs = [FieldDef("text", "Text"), FieldDef("url_host", "ShortString")]
    recs = _records(N_ENTITIES, NUM_CPUS)
    n_pages = recs.count()

    # --- audit every registry candidate over the REAL corpus ---------
    t0 = time.monotonic()
    stats = key_stats_of(
        audit_predicates(recs, candidate_simple_predicates(fdefs), fdefs))
    audit_wall = round(time.monotonic() - t0, 1)

    def audit_more(more_specs):
        extra = key_stats_of(audit_predicates(recs, more_specs, fdefs))
        stats.update(extra)
        return extra

    # --- learn with exact corpus-scale costs --------------------------
    from dedupe_api_ray.fixtures import make_pages_corpus, record_id_of_url
    tiny = make_pages_corpus(n_entities=200, seed=42)
    cols = tiny["pages"].to_pydict()
    sample = {record_id_of_url(u): {"text": t, "url_host": u.split("/")[2]}
              for u, t in zip(cols["url"], cols["text"])}
    lp = tiny["labeled_pairs"].to_pydict()
    labeled = list(zip(lp["id_a"], lp["id_b"], lp["label"]))
    nsample = {rid: _normalize_record(r, fdefs) for rid, r in sample.items()}
    matches = [(a, b) for a, b, lab in labeled if lab]

    t0 = time.monotonic()
    learned = learn_predicates(nsample, matches, fdefs, max_predicates=3,
                               key_stats=dict(stats), audit_fn=audit_more,
                               recall_target=0.95)
    learn_wall = round(time.monotonic() - t0, 1)

    # --- full partition with the learned union -----------------------
    model = bench.bench_model()
    model.predicates = list(learned)
    t0 = time.monotonic()
    metrics: dict = {}
    em = partition(recs, model, threshold=0.5,
                   max_block_size=200, hard_cap=2000,
                   scorer_concurrency=(1, NUM_CPUS), exact_collapse=True,
                   metrics=metrics)
    em_df = em.to_pandas()
    wall = round(time.monotonic() - t0, 1)
    em_df = em_df.sort_values(["record_id", "cluster_id"]) \
        .reset_index(drop=True)
    em_hash = hashlib.md5(
        "\n".join(f"{r}|{c}" for r, c in
                  zip(em_df["record_id"], em_df["cluster_id"])).encode()
    ).hexdigest()

    report = {
        "metric": "partition_wall_learned_predicates",
        "n_entities": N_ENTITIES, "n_pages": n_pages,
        "num_cpus": NUM_CPUS,
        "audit_wall_sec": audit_wall, "learn_wall_sec": learn_wall,
        "partition_wall_sec": wall,
        "learned_union": [p.pred_id for p in learned],
        "est_candidate_pairs": metrics.get("est_candidate_pairs"),
        "blocking_metrics": {
            k: v for k, v in metrics.items()
            if isinstance(v, (int, float, str, bool))},
        "entity_map_rows": len(em_df), "entity_map_hash": em_hash,
    }
    print(json.dumps(report))
    path = "BENCH/learned_r5.json"
    if os.path.isdir("BENCH"):
        doc = {"runs": []}
        if os.path.exists(path):
            try:
                with open(path) as f:
                    doc = json.load(f)
            except Exception:
                pass
        key = (N_ENTITIES, NUM_CPUS)
        doc["runs"] = [r for r in doc.get("runs", [])
                       if (r.get("n_entities"), r.get("num_cpus")) != key] \
            + [report]
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
