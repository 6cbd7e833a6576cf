"""Sources and sinks (SURVEY.md §2.1 S1/S3/S6).

Reference parity (†): dedupe-api ingests CSV/JSON record uploads into
a records table, exports entity maps / results as file downloads, and
round-trips labeled training pairs as a JSON file in dedupe's
``{"match": [...], "distinct": [...]}`` shape
(dedupe:dedupe/api.py::write_training / read_training format).

Ray shapes: readers are thin wrappers over ``ray.data.read_parquet`` /
``read_csv`` that enforce column pruning at the read (only requested
columns leave storage); the entity-map sink writes PARTITIONED files
(one per block) so a failed run can resume per partition and no single
giant file is produced.
"""

from __future__ import annotations

import json

import ray.data


def read_records(path: str, columns: list[str] | None = None,
                 **kwargs) -> ray.data.Dataset:
    """S1: column-pruned parquet records source."""
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def read_records_csv(path: str, columns: list[str] | None = None,
                     **kwargs) -> ray.data.Dataset:
    """S1 (CSV ingest path †).  CSV cannot prune at the read; columns
    are dropped immediately after parse instead."""
    ds = ray.data.read_csv(path, **kwargs)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_entity_map(entity_map: ray.data.Dataset, path: str,
                     fmt: str = "parquet") -> int:
    """S5/S6: export the (record_id, cluster_id, confidence) entity map.
    ``fmt``: parquet (resumable canonical sink), csv or json (the
    reference's result-download formats †).

    Returns the number of rows written, counted from the dataset the
    sink streams from: the input is materialized ONCE (so the lazy
    plan — possibly an entire scoring pipeline — executes exactly
    once), counted from block metadata (free), then written.  Counting
    by re-reading the output directory would both re-scan the files
    and mis-count stale files from a previous run in the same path."""
    if fmt not in ("parquet", "csv", "json"):
        raise ValueError(f"unknown export format {fmt!r}")
    mat = entity_map.materialize()
    n = mat.count()  # metadata-only on a materialized dataset
    getattr(mat, f"write_{fmt}")(path)
    return n


def write_training(path: str, records: dict[int, dict],
                   labeled_pairs: list[tuple[int, int, bool]]) -> None:
    """S3 †: labeled pairs → dedupe-style JSON training file
    ``{"match": [[recA, recB], ...], "distinct": [...]}``; each record
    dict additionally carries ``_record_id`` so the pair ids round-trip
    (the reference stores values only — a documented extension)."""
    def rec(rid: int) -> dict:
        out = {k: v for k, v in records[rid].items()
               if not k.endswith("__tokens")}
        out["_record_id"] = rid
        return out

    payload = {"match": [], "distinct": []}
    for a, b, lbl in labeled_pairs:
        payload["match" if lbl else "distinct"].append([rec(a), rec(b)])
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)


def read_training(path: str) -> tuple[dict[int, dict],
                                      list[tuple[int, int, bool]]]:
    """S3 †: JSON training file → (records, labeled_pairs)."""
    with open(path) as f:
        payload = json.load(f)
    records: dict[int, dict] = {}
    labeled: list[tuple[int, int, bool]] = []
    for key, lbl in (("match", True), ("distinct", False)):
        for rec_a, rec_b in payload.get(key, []):
            ids = []
            for rec in (rec_a, rec_b):
                rid = int(rec["_record_id"])
                records[rid] = {k: v for k, v in rec.items()
                                if k != "_record_id"}
                ids.append(rid)
            labeled.append((ids[0], ids[1], lbl))
    return records, labeled
