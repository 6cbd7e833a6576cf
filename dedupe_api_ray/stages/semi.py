"""Semi and anti joins by key — keep (semi) or drop (anti) each left
row according to whether its key exists on the right side (SQL
``WHERE [NOT] EXISTS``).  The primitives an incremental pipeline
composes constantly: "only new ids", "skip finished partitions",
"records with at least one candidate pair".

Scale shape: the right side is reduced to DISTINCT keys per batch
BEFORE the shuffle (a combiner — existence only needs each key once
per block), then both sides hash-partition by key in ONE shuffle via
a union, and each partition resolves membership with a single
factorize + bincount per side.  No payload from the right ever moves;
output carries exactly the left columns.

SQL null semantics: a NULL key never matches — a null-key left row is
dropped by the semi join and kept by the anti join, and null right
keys are discarded at the combiner.

Like the sibling as-of/interval joins, partition ids come from
``pandas.util.hash_array`` (deterministic across processes), so the
result is independent of block layout and parallelism (tested in
``tests/test_semi.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dedupe_api_ray.stages.asof import _arrow_schema, _tag_partition


def _membership_partition(g: pa.Table, key: str, left_cols: list[str],
                          anti: bool) -> pa.Table:
    side = g["__side"].to_numpy(zero_copy_only=False)
    kv = g[key].to_numpy(zero_copy_only=False)
    codes, _ = pd.factorize(kv, sort=False)  # nulls → -1
    valid = pc.is_valid(g[key]).to_numpy(zero_copy_only=False)
    lidx = np.flatnonzero(side == 1)
    right_codes = codes[(side == 0) & valid]
    n_codes = int(codes.max()) + 1 if len(codes) else 0
    present = np.zeros(n_codes + 1, dtype=bool)
    if len(right_codes):
        present[right_codes] = True
    lc = codes[lidx]
    hit = present[np.where(lc >= 0, lc, n_codes)] & valid[lidx]
    keep = lidx[~hit if anti else hit]  # already ascending
    tk = pa.array(keep, pa.int64())
    return pa.table({c: g[c].take(tk) for c in left_cols})


def _exists_join(left: ray.data.Dataset, right: ray.data.Dataset,
                 left_on: str, right_on: str | None, anti: bool,
                 num_partitions: int | None) -> ray.data.Dataset:
    from dedupe_api_ray.utils import shuffle_partitions
    n_parts = shuffle_partitions(num_partitions)
    right_on = right_on or left_on
    left_schema = _arrow_schema(left)
    left_cols = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_schema = _arrow_schema(right)
    if right_on not in right_schema.names:
        raise ValueError(f"right side lacks column {right_on!r}")

    def tag_left(t: pa.Table) -> pa.Table:
        return _tag_partition(t.select(left_cols), 1, left_on, n_parts)

    def tag_right(t: pa.Table) -> pa.Table:
        # combiner: existence needs each key once per block, and null
        # keys never match anything
        keys = pc.unique(pc.drop_null(
            pc.cast(t[right_on], left_types[left_on])))
        arrs = [keys if c == left_on else pa.nulls(len(keys),
                                                   left_types[c])
                for c in left_cols]
        return _tag_partition(pa.table(dict(zip(left_cols, arrs))), 0,
                              left_on, n_parts)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    def kernel(g: pa.Table) -> pa.Table:
        return _membership_partition(g, left_on, left_cols, anti)

    return unioned.groupby("__part", num_partitions=n_parts) \
        .map_groups(kernel, batch_format="pyarrow")


def semi_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
              left_on: str, right_on: str | None = None,
              num_partitions: int | None = None) -> ray.data.Dataset:
    """Left rows whose key EXISTS on the right (left columns only)."""
    return _exists_join(left, right, left_on, right_on, False,
                        num_partitions)


def anti_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
              left_on: str, right_on: str | None = None,
              num_partitions: int | None = None) -> ray.data.Dataset:
    """Left rows whose key does NOT exist on the right (left columns
    only; null-key left rows are kept, per SQL NOT EXISTS)."""
    return _exists_join(left, right, left_on, right_on, True,
                        num_partitions)
