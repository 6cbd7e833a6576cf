"""Measure stages/audit.py on the bench corpora and record the result.

Two experiments, one JSON line each (recorded in BENCH/):

1. --attribute N : audit the PINNED bench-model predicates over the
   N-entity pages corpus — attributes the corpus' candidate-pair
   volume (e.g. the 135M-pair cliff at 950k pages, BENCH/BASELINE.md)
   to individual predicates, exactly.
2. --learn N : audit EVERY registry candidate for the bench fields
   (text:Text, url_host:ShortString) over the N-entity corpus, feed
   key_stats into train_model, and compare the chosen union + its
   exact audited pair volume against the sample-cost union.

Usage: python tools/audit_bench.py --attribute 400000
       python tools/audit_bench.py --learn 25000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _records(n_entities: int, num_cpus: int):
    """Raw pages -> the same records the bench flagship ingests."""
    import pyarrow as pa
    import ray.data

    os.environ["BENCH_ENTITIES"] = str(n_entities)
    import importlib

    import bench
    importlib.reload(bench)
    pages_path = bench.ensure_corpus()

    from dedupe_api_ray.fixtures import record_id_of_url
    from dedupe_api_ray.functions.text import (extract_text_batch,
                                               normalize_array)

    def ingest_batch(t: pa.Table) -> pa.Table:
        t = extract_text_batch(t, "html", "text_extracted")
        urls = t["url"].to_pylist()
        rids = pa.array([record_id_of_url(u) for u in urls], pa.int64())
        hosts = pa.array([u.split("/")[2] for u in urls], pa.string())
        norm = normalize_array(t["text_extracted"])
        return pa.table({"record_id": rids, "url_host": hosts,
                         "text": norm})

    return ray.data.read_parquet(
        pages_path, override_num_blocks=num_cpus * 3) \
        .map_batches(ingest_batch, batch_format="pyarrow",
                     batch_size=2048).materialize()


def cmd_attribute(n_entities: int, num_cpus: int) -> dict:
    from dedupe_api_ray.model import FieldDef, PredicateSpec
    from dedupe_api_ray.stages.audit import audit_predicates

    import bench
    model = bench.bench_model()
    fdefs = [FieldDef("text", "Text"), FieldDef("url_host", "ShortString")]
    specs = list(model.predicates) + [
        PredicateSpec("simple", "text", "firstTokenPredicate"),
        PredicateSpec("simple", "text", "wholeFieldPredicate"),
    ]
    recs = _records(n_entities, num_cpus)
    t0 = time.monotonic()
    audit = audit_predicates(recs, specs, fdefs).to_pandas()
    wall = round(time.monotonic() - t0, 1)
    rows = [{"predicate": r.predicate, "n_keys": int(r.n_keys),
             "n_rows": int(r.n_rows), "max_key_rows": int(r.max_key_rows),
             "est_pairs": float(r.est_pairs),
             "in_bench_model": i < len(model.predicates)}
            for i, r in audit.iterrows()]
    return {"metric": "predicate_audit_attribution",
            "n_entities": n_entities, "n_pages": recs.count(),
            "num_cpus": num_cpus, "audit_wall_sec": wall,
            "predicates": rows}


def cmd_learn(n_entities: int, num_cpus: int) -> dict:
    from dedupe_api_ray.fixtures import make_pages_corpus, record_id_of_url
    from dedupe_api_ray.model import FieldDef, train_model
    from dedupe_api_ray.stages.audit import (audit_predicates,
                                             candidate_simple_predicates,
                                             key_stats_of)

    fdefs = [FieldDef("text", "Text"), FieldDef("url_host", "ShortString")]
    specs = candidate_simple_predicates(fdefs)
    recs = _records(n_entities, num_cpus)
    t0 = time.monotonic()
    audit = audit_predicates(recs, specs, fdefs)
    stats = key_stats_of(audit)
    audit_wall = round(time.monotonic() - t0, 1)

    # same tiny labeled fixture the bench model trains on
    tiny = make_pages_corpus(n_entities=200, seed=42)
    cols = tiny["pages"].to_pydict()
    sample = {record_id_of_url(u): {"text": t, "url_host": u.split("/")[2]}
              for u, t in zip(cols["url"], cols["text"])}
    lp = tiny["labeled_pairs"].to_pydict()
    labeled = list(zip(lp["id_a"], lp["id_b"], lp["label"]))

    def audit_more(more_specs):
        extra = key_stats_of(audit_predicates(recs, more_specs, fdefs))
        stats.update(extra)
        return extra

    def union_cost(preds) -> float:
        # audited upper bound: sum of per-predicate pair volumes
        # (the cross-predicate distinct only removes overlap); any
        # compound the greedy built was audited exactly via audit_fn
        out = 0.0
        for p in preds:
            if p.pred_id in stats:
                out += stats[p.pred_id]
            elif p.kind == "compound":
                out += min(stats.get(f"{n}:{f}", 0.0) for n, f in p.parts)
        return out

    from dedupe_api_ray.model import learn_predicates, _normalize_record
    nsample = {rid: _normalize_record(r, fdefs) for rid, r in sample.items()}
    matches = [(a, b) for a, b, l in labeled if l]
    base = learn_predicates(nsample, matches, fdefs, max_predicates=3)
    out = {"metric": "predicate_audit_learning",
           "n_entities": n_entities, "n_pages": recs.count(),
           "num_cpus": num_cpus, "audit_wall_sec": audit_wall,
           "n_candidates": len(specs),
           "top_cost_candidates": {p: round(v, 1) for p, v in sorted(
               stats.items(), key=lambda kv: -kv[1])[:8]},
           "sample_cost_union": [p.pred_id for p in base],
           "sample_cost_union_pairs": union_cost(base)}
    for rt in (1.0, 0.95):
        fed = learn_predicates(nsample, matches, fdefs, max_predicates=3,
                               key_stats=dict(stats), audit_fn=audit_more,
                               recall_target=rt)
        tag = "audited_union" if rt == 1.0 else "audited_union_r95"
        out[tag] = [p.pred_id for p in fed]
        out[tag + "_pairs"] = union_cost(fed)
    return out


def main() -> int:
    import ray

    ap = argparse.ArgumentParser()
    ap.add_argument("--attribute", type=int, default=None)
    ap.add_argument("--learn", type=int, default=None)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR",
                 object_store_memory=24 * (1 << 30))
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
    try:
        if args.attribute:
            print(json.dumps(cmd_attribute(args.attribute, args.num_cpus)))
        if args.learn:
            print(json.dumps(cmd_learn(args.learn, args.num_cpus)))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
