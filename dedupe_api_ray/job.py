"""`ray job submit` entrypoint (SURVEY.md §7 M7; BASELINE.json
north_star "driven by ray job submit on fixed clusters").

Reference parity (†): dedupe-api's delayed-job queue pops a task name
(dedupe-api:api/queue.py::DelayedResult / processQueue) and runs the
E1 chain (train → block → score → cluster → entity_map) against
Postgres.  Here each flow is one submittable batch job over Parquet:

    ray job submit --working-dir . -- \
        python -m dedupe_api_ray.job partition \
            --input  s3://bucket/records/ \
            --model  settings.pkl \
            --output s3://bucket/entity_map/ \
            --ckpt-dir s3://bucket/ckpt/run1

The driver process owns the Ray session (`ray.init` is guarded so a
pre-initialised session — e.g. the pytest fixture — is reused and NOT
shut down).  Reads are column-pruned to the model's fields; the sink
is partitioned Parquet (resumable); one JSON metrics line goes to
stdout so the job log carries row counts, wall time and the blocking
skew metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _parse_fields(spec: str):
    """"text:Text,url_host:ShortString" → [FieldDef, ...]."""
    from dedupe_api_ray.model import FieldDef

    out = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, kind = part.partition(":")
        out.append(FieldDef(name.strip(), (kind or "String").strip()))
    if not out:
        raise SystemExit(f"--fields: no fields parsed from {spec!r}")
    return out


def _read_input(path: str, columns: list[str] | None):
    from dedupe_api_ray.sources.io import read_records, read_records_csv

    if path.endswith(".csv"):
        return read_records_csv(path, columns=columns)
    return read_records(path, columns=columns)


def _model_columns(model, id_col: str) -> list[str]:
    cols = [id_col]
    for f in model.field_defs:
        if f.type != "Interaction" and f.field not in cols:
            cols.append(f.field)
    return cols


def cmd_train(args) -> dict:
    """E3 head †: labeled training JSON (records embedded, dedupe's
    match/distinct shape) → trained settings file.

    ``--audit-input``: a corpus parquet to run the candidate
    predicates over FIRST (distributed), so the blocking learner
    costs each predicate by its exact corpus-scale pair volume
    instead of a sample estimate — the control against stopword /
    fixed-cardinality predicates going quadratic at scale."""
    from dedupe_api_ray.model import train_model
    from dedupe_api_ray.sources.io import read_training

    records, labeled = read_training(args.training)
    field_defs = _parse_fields(args.fields)
    key_stats = None
    audit_summary = None
    if args.audit_input:
        from dedupe_api_ray.stages.audit import (audit_predicates,
                                                 candidate_simple_predicates,
                                                 key_stats_of)
        specs = candidate_simple_predicates(field_defs)
        cols = [args.id_col] + sorted({s.field for s in specs})
        audit = audit_predicates(_read_input(args.audit_input, cols),
                                 specs, field_defs, id_col=args.id_col)
        key_stats = key_stats_of(audit)
        audit_summary = {p: round(v, 1) for p, v in sorted(
            key_stats.items(), key=lambda kv: -kv[1])[:10]}
    model = train_model(records, labeled, field_defs,
                        alpha=args.alpha,
                        max_predicates=args.max_predicates,
                        key_stats=key_stats)
    model.save(args.output)
    out = {"job": "train", "records": len(records),
           "labeled_pairs": len(labeled),
           "predicates": [repr(p) for p in model.predicates],
           "output": args.output}
    if audit_summary is not None:
        out["audit_top_pair_costs"] = audit_summary
    return out


def cmd_partition(args) -> dict:
    """E1 core †: records parquet → entity_map (partitioned sink)."""
    from dedupe_api_ray.model import Model
    from dedupe_api_ray.pipelines.dedupe import partition
    from dedupe_api_ray.sources.io import write_entity_map

    model = Model.load(args.model)
    columns = (args.columns.split(",") if args.columns
               else _model_columns(model, args.id_col))
    ds = _read_input(args.input, columns)
    metrics: dict = {}
    entity_map = partition(
        ds, model, args.threshold, id_col=args.id_col,
        ckpt_dir=args.ckpt_dir, max_block_size=args.max_block_size,
        hard_cap=args.hard_cap, metrics=metrics)
    n = write_entity_map(entity_map, args.output, fmt=args.format)
    return {"job": "partition", "rows": n,
            "blocking_metrics": metrics, "output": args.output}


def cmd_recordlink(args) -> dict:
    """E1 two-table mode †: left × right → one-to-one links above
    threshold (greedy matching, G3)."""
    from dedupe_api_ray.model import Model
    from dedupe_api_ray.pipelines.recordlink import recordlink_candidate_pairs
    from dedupe_api_ray.stages.clustering import greedy_matching
    from dedupe_api_ray.stages.scoring import attach_payload, score_pairs
    from dedupe_api_ray.sources.io import write_entity_map

    model = Model.load(args.model)
    cols = _model_columns(model, args.id_col)
    left = _read_input(args.left, cols)
    right = _read_input(args.right, cols)
    if args.id_col != "record_id":
        left = left.rename_columns({args.id_col: "record_id"})
        right = right.rename_columns({args.id_col: "record_id"})
    pairs = recordlink_candidate_pairs(left, right, model)
    scored = score_pairs(attach_payload(pairs, left.union(right), model),
                         model)
    links = greedy_matching(scored, args.threshold)
    n = write_entity_map(links, args.output, fmt=args.format)
    return {"job": "recordlink", "rows": n,
            "output": args.output}


def cmd_incremental(args) -> dict:
    """Fold a crawl increment into an existing entity map: assign new
    records to existing clusters via the trained model (recordlink
    blocking vs canon reps), partition only the unmatched remainder
    (pipelines/incremental.py)."""
    from dedupe_api_ray.model import Model
    from dedupe_api_ray.pipelines.incremental import incremental_partition
    from dedupe_api_ray.sources.io import write_entity_map

    model = Model.load(args.model)
    cols = _model_columns(model, args.id_col)
    new = _read_input(args.input, cols)
    canon_cols = [args.canon_id_col] + [c for c in cols
                                        if c != args.id_col]
    canon = _read_input(args.canon, canon_cols)
    metrics: dict = {}
    em = incremental_partition(
        new, canon, model, args.threshold, id_col=args.id_col,
        canon_id_col=args.canon_id_col, metrics=metrics,
        ckpt_dir=args.ckpt_dir, max_block_size=args.max_block_size,
        hard_cap=args.hard_cap)
    n = write_entity_map(em, args.output, fmt=args.format)
    return {"job": "incremental", "rows": n,
            "blocking_metrics": metrics, "output": args.output}


def cmd_gazetteer(args) -> dict:
    """E2 batch analog †: per query row, top-n canon matches."""
    from dedupe_api_ray.pipelines.gazetteer import gazetteer_topn
    from dedupe_api_ray.sources.io import write_entity_map

    queries = _read_input(args.input, None)
    canon = _read_input(args.canon, None)
    out = gazetteer_topn(queries, canon, n=args.n,
                         threshold=args.threshold,
                         id_col=args.id_col, text_col=args.text_col,
                         mode=args.mode)
    n = write_entity_map(out, args.output, fmt=args.format)
    return {"job": "gazetteer", "rows": n,
            "output": args.output}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m dedupe_api_ray.job",
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--ray-address", default=os.environ.get("RAY_ADDRESS"),
                   help="Ray cluster address (default: $RAY_ADDRESS / "
                        "auto-detect; a job-submit runtime presets this)")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="labeled JSON -> settings.pkl")
    t.add_argument("--training", required=True,
                   help="dedupe-style {match, distinct} JSON file")
    t.add_argument("--fields", required=True,
                   help='e.g. "text:Text,url_host:ShortString"')
    t.add_argument("--output", required=True, help="settings .pkl path")
    t.add_argument("--alpha", type=float, default=0.1)
    t.add_argument("--max-predicates", type=int, default=4)
    t.add_argument("--audit-input", default=None,
                   help="corpus parquet: cost candidate predicates by "
                        "their EXACT corpus-scale pair volume (distributed "
                        "audit) instead of the sample estimate")
    t.add_argument("--id-col", default="record_id",
                   help="id column of --audit-input")
    t.set_defaults(fn=cmd_train)

    d = sub.add_parser("partition", help="records -> entity map")
    d.add_argument("--input", required=True, help="parquet dir/file or .csv")
    d.add_argument("--model", required=True, help="settings .pkl")
    d.add_argument("--output", required=True)
    d.add_argument("--threshold", type=float, default=0.5)
    d.add_argument("--id-col", default="record_id")
    d.add_argument("--columns", default=None,
                   help="read-pruned columns (default: id + model fields)")
    d.add_argument("--ckpt-dir", default=None,
                   help="per-stage parquet checkpoints + manifests")
    d.add_argument("--max-block-size", type=int, default=500)
    d.add_argument("--hard-cap", type=int, default=20_000)
    d.add_argument("--format", default="parquet",
                   choices=["parquet", "csv", "json"])
    d.set_defaults(fn=cmd_partition)

    r = sub.add_parser("recordlink", help="left x right -> 1:1 links")
    r.add_argument("--left", required=True)
    r.add_argument("--right", required=True)
    r.add_argument("--model", required=True)
    r.add_argument("--output", required=True)
    r.add_argument("--threshold", type=float, default=0.5)
    r.add_argument("--id-col", default="record_id")
    r.add_argument("--format", default="parquet",
                   choices=["parquet", "csv", "json"])
    r.set_defaults(fn=cmd_recordlink)

    i = sub.add_parser("incremental",
                       help="new records x existing canon -> entity map")
    i.add_argument("--input", required=True, help="the new increment")
    i.add_argument("--canon", required=True,
                   help="one representative row per existing cluster "
                        "(cluster id + the model's fields)")
    i.add_argument("--model", required=True)
    i.add_argument("--output", required=True)
    i.add_argument("--threshold", type=float, default=0.5)
    i.add_argument("--id-col", default="record_id")
    i.add_argument("--canon-id-col", default="cluster_id")
    i.add_argument("--ckpt-dir", default=None,
                   help="checkpoints for the remainder partition pass")
    i.add_argument("--max-block-size", type=int, default=500)
    i.add_argument("--hard-cap", type=int, default=20_000)
    i.add_argument("--format", default="parquet",
                   choices=["parquet", "csv", "json"])
    i.set_defaults(fn=cmd_incremental)

    g = sub.add_parser("gazetteer", help="queries x canon -> top-n")
    g.add_argument("--input", required=True, help="query rows")
    g.add_argument("--canon", required=True, help="canonical rows")
    g.add_argument("--output", required=True)
    g.add_argument("--n", type=int, default=2)
    g.add_argument("--threshold", type=float, default=0.0)
    g.add_argument("--id-col", default="doc_id")
    g.add_argument("--text-col", default="text")
    g.add_argument("--mode", default="auto",
                   choices=["auto", "broadcast", "lsh"])
    g.add_argument("--format", default="parquet",
                   choices=["parquet", "csv", "json"])
    g.set_defaults(fn=cmd_gazetteer)
    return p


def main(argv: list[str] | None = None) -> int:
    import ray

    args = build_parser().parse_args(argv)
    t0 = time.monotonic()
    started = False
    if not ray.is_initialized():
        kw = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.ray_address:
            kw["address"] = args.ray_address
        ray.init(**kw)
        started = True
    try:
        result = args.fn(args)
    finally:
        if started:
            ray.shutdown()
    result["wall_sec"] = round(time.monotonic() - t0, 2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
