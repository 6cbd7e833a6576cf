"""Levenshtein canopy / search predicates (SURVEY.md §2.3 P22).

Reference (†): dedupe:dedupe/levenshtein.py — LevenshteinCanopyPredicate
and LevenshteinSearchPredicate (distances 1..4) over the
Levenshtein_search C extension's edit-distance index.

Here: a pure-Python BK-tree over the field values (the classic
metric-tree for edit-distance range queries), with the same canopy
semantics as the TF-IDF variant — records swept in ascending record_id
order, first unassigned record becomes a center, every value within
``distance`` joins its canopy.  Driver-side sweep like the reference's
in-memory index †; the distributed passes are the per-batch value
extraction.  Search variant: every indexed record within distance is a
key (used on RecordLink sides).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def levenshtein(a: str, b: str, cap: int | None = None) -> int:
    """Classic two-row DP edit distance; early-exits above ``cap``."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if cap is not None and abs(la - lb) > cap:
        return cap + 1
    if la < lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        row_min = cur[0]
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if cur[j] < row_min:
                row_min = cur[j]
        if cap is not None and row_min > cap:
            return cap + 1
        prev = cur
    return prev[lb]


class BKTree:
    """BK-tree over strings; range queries within edit distance d."""

    def __init__(self) -> None:
        self.root: list | None = None  # [value, payloads, {dist: child}]

    def add(self, value: str, payload) -> None:
        if self.root is None:
            self.root = [value, [payload], {}]
            return
        node = self.root
        while True:
            d = levenshtein(value, node[0])
            if d == 0:
                node[1].append(payload)
                return
            child = node[2].get(d)
            if child is None:
                node[2][d] = [value, [payload], {}]
                return
            node = child

    def search(self, value: str, max_dist: int) -> list:
        out: list = []
        if self.root is None:
            return out
        stack = [self.root]
        while stack:
            node = stack.pop()
            d = levenshtein(value, node[0])  # exact d needed to navigate
            if d <= max_dist:
                out.extend(node[1])
            lo, hi = d - max_dist, d + max_dist
            for dist, child in node[2].items():
                if lo <= dist <= hi:
                    stack.append(child)
        return out


def _collect_values(records: ray.data.Dataset, field: str, id_col: str
                    ) -> list[tuple[int, str]]:
    rows: list[tuple[int, str]] = []
    for batch in records.select_columns([id_col, field]).iter_batches(
            batch_format="pyarrow", batch_size=65536):
        for rid, v in zip(batch[id_col].to_pylist(), batch[field].to_pylist()):
            if v:
                rows.append((rid, v))
    rows.sort()  # pinned ascending record_id order (canopy determinism)
    return rows


def levenshtein_canopy_keys(records: ray.data.Dataset, field: str,
                            distance: int = 2, id_col: str = "record_id",
                            pred_tag: str = "lev",
                            driver_max_values: int = 2_000_000
                            ) -> ray.data.Dataset:
    """P22 canopy: (block_key='{pred_tag}:{center_id}', record_id).

    Scale shape: the driver sweep runs over DISTINCT field values only
    (a distributed groupby collapses duplicates first, keeping each
    value's min record_id), which is EXACTLY equivalent to the
    per-record sweep — a record's canopy depends only on its value and
    the first-occurrence (min-rid) order of values, and every record of
    an already-assigned value is already assigned in the record-level
    sweep.  Driver memory is bounded by the value vocabulary, not the
    corpus; a vocabulary above ``driver_max_values`` fails loudly
    (MinHash-LSH blocking is the alternative for such fields).  The
    final key emission is a distributed map over a broadcast
    value→center dict."""
    import ray as _ray

    distinct = records.select_columns([id_col, field]) \
        .groupby(field).min(id_col)
    n_vals = distinct.count()
    if n_vals > driver_max_values:
        raise RuntimeError(
            f"levenshtein_canopy: {n_vals} distinct '{field}' values "
            f"exceed driver_max_values={driver_max_values}; this field "
            "has no short-string canopy structure — use MinHash-LSH "
            "blocking (dedupe_api_ray.extras.dedup) instead")
    rows: list[tuple[int, str]] = []
    for batch in distinct.iter_batches(batch_format="pyarrow",
                                       batch_size=65536):
        vals = batch[field].to_pylist()
        mrids = batch[f"min({id_col})"].to_pylist()
        rows.extend((r, v) for r, v in zip(mrids, vals) if v)
    rows.sort()  # pinned first-occurrence (min-rid) order

    tree = BKTree()
    for mrid, v in rows:
        tree.add(v, v)
    center_of: dict[str, int] = {}
    for mrid, v in rows:
        if v in center_of:
            continue
        center_of[v] = mrid
        for other_val in tree.search(v, distance):
            if other_val not in center_of:
                center_of[other_val] = mrid
    map_ref = _ray.put(center_of)

    def emit(t: pa.Table) -> pa.Table:
        cmap = _ray.get(map_ref)
        out_k: list[str] = []
        out_r: list[int] = []
        for rid, v in zip(t[id_col].to_pylist(), t[field].to_pylist()):
            if v:
                out_k.append(f"{pred_tag}:{cmap[v]}")
                out_r.append(rid)
        return pa.table({"block_key": pa.array(out_k, pa.string()),
                         "record_id": pa.array(out_r, pa.int64())})

    return records.select_columns([id_col, field]).map_batches(
        emit, batch_format="pyarrow")


def levenshtein_search_keys(queries: ray.data.Dataset,
                            index: ray.data.Dataset, field: str,
                            distance: int = 2, id_col: str = "record_id",
                            pred_tag: str = "levs",
                            concurrency: int | tuple | None = None
                            ) -> ray.data.Dataset:
    """P22 search: query keys = ids of all indexed values within
    ``distance``; the BK-tree is built once per actor from a broadcast
    of the indexed side."""
    from dedupe_api_ray.utils import actor_pool
    if concurrency is None:
        concurrency = actor_pool()
    import ray as _ray

    rows = _collect_values(index, field, id_col)
    rows_ref = _ray.put(rows)

    class Probe:
        def __init__(self):
            self.tree = BKTree()
            for rid, v in _ray.get(rows_ref):
                self.tree.add(v, rid)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_key: list[str] = []
            out_rid: list[int] = []
            for qid, v in zip(batch[id_col].to_pylist(),
                              batch[field].to_pylist()):
                if not v:
                    continue
                for other in self.tree.search(v, distance):
                    out_key.append(f"{pred_tag}:{other}")
                    out_rid.append(qid)
            return pa.table({"block_key": pa.array(out_key, pa.string()),
                             "record_id": pa.array(out_rid, pa.int64())})

    return queries.map_batches(Probe, batch_format="pyarrow",
                               concurrency=concurrency, num_cpus=1)
