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
                            pred_tag: str = "lev") -> ray.data.Dataset:
    """P22 canopy: (block_key='{pred_tag}:{center_id}', record_id)."""
    rows = _collect_values(records, field, id_col)
    tree = BKTree()
    for rid, v in rows:
        tree.add(v, rid)
    assigned: dict[int, int] = {}
    for rid, v in rows:
        if rid in assigned:
            continue
        assigned[rid] = rid
        for other in tree.search(v, distance):
            if other not in assigned:
                assigned[other] = rid
    rids = sorted(assigned)
    return ray.data.from_arrow(pa.table({
        "block_key": pa.array([f"{pred_tag}:{assigned[r]}" for r in rids],
                              pa.string()),
        "record_id": pa.array(rids, pa.int64()),
    }))


def levenshtein_search_keys(queries: ray.data.Dataset,
                            index: ray.data.Dataset, field: str,
                            distance: int = 2, id_col: str = "record_id",
                            pred_tag: str = "levs",
                            concurrency: int | tuple = (1, 4)
                            ) -> ray.data.Dataset:
    """P22 search: query keys = ids of all indexed values within
    ``distance``; the BK-tree is built once per actor from a broadcast
    of the indexed side."""
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
