"""Grouped exact distinct count — ``COUNT(*)`` + ``COUNT(DISTINCT
col)`` per key in one shuffle, with map-side combining.

Ray Data's built-in aggregates have no distinct-count; the naive
two-step (``groupby([key, col]).count()`` then ``groupby(key)``)
shuffles twice and moves one row per surviving pair both times.  This
stage instead:

1. combines per batch with ONE Arrow ``group_by([key, col])`` — the
   shuffle moves one (key, col, n) partial per distinct pair per
   block, so heavily repeated pairs (the common case in logs) collapse
   map-side;
2. hash-partitions by KEY ONLY (``_tag_partition``, deterministic
   across processes), so one kernel resolves both aggregates: a single
   ``np.lexsort`` over (key, col) codes, pair/key boundary flags, and
   two ``np.add.reduceat`` calls.  No per-key Python.

SQL semantics: ``n_rows`` counts every input row (null col included);
``n_distinct`` ignores null col values, per ``COUNT(DISTINCT ...)``.
Skew note: one key's DISTINCT pairs must fit in a partition — the
same assumption as the join family; raw duplicate volume is already
collapsed map-side and cannot skew the shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dedupe_api_ray.stages.asof import (_composite_heads, _sort_key_ints,
                                        _tag_partition_keys)


def _distinct_partition(g: pa.Table, keys: list[str], col: str,
                        n_rows: str, n_distinct: str) -> pa.Table:
    n = g.num_rows
    kcs = [_sort_key_ints(g[k]) for k in keys]
    # arrow-side normalization before factorize: nullable int64 would
    # float64-promote and collapse distinct values >= 2^53 (distinct
    # undercount); _norm_key_array keeps int64 exact (nulls -> 0,
    # masked back to -1 here via validity)
    from dedupe_api_ray.stages.asof import _norm_key_array
    cv = _norm_key_array(g[col], g[col].type)
    codes, _ = pd.factorize(cv, sort=False)
    valid_c = pc.is_valid(g[col]).to_numpy(zero_copy_only=False)
    codes = np.where(valid_c, codes, -1)  # nulls → -1
    cnt = g["__n"].to_numpy(zero_copy_only=False)
    order = np.lexsort((codes, *reversed(kcs)))
    cs, ns = codes[order], cnt[order]
    key_head = _composite_heads(kcs, order, n)
    pair_head = key_head.copy()
    if n:
        pair_head[1:] |= cs[1:] != cs[:-1]
    starts = np.flatnonzero(key_head)
    rows = np.add.reduceat(ns, starts) if n else np.zeros(0, np.int64)
    dv = (pair_head & (cs >= 0)).astype(np.int64)
    dist = np.add.reduceat(dv, starts) if n else np.zeros(0, np.int64)
    take = pa.array(order[starts], pa.int64())
    out = {k: g[k].take(take) for k in keys}
    out[n_rows] = pa.array(rows.astype(np.int64), pa.int64())
    out[n_distinct] = pa.array(dist, pa.int64())
    return pa.table(out)


def grouped_distinct_count(ds: ray.data.Dataset, *,
                           key: str | list[str], col: str,
                           n_rows: str = "n_rows",
                           n_distinct: str = "n_distinct",
                           num_partitions: int | None = None
                           ) -> ray.data.Dataset:
    """Per key (one column or a composite list): total row count and
    exact distinct count of ``col`` (nulls excluded from the distinct,
    counted in the total)."""
    from dedupe_api_ray.utils import shuffle_partitions
    keys = [key] if isinstance(key, str) else list(key)
    if not keys:
        raise ValueError("grouped_distinct_count: key list is empty")
    n_parts = shuffle_partitions(num_partitions)

    def combine(t: pa.Table) -> pa.Table:
        # probe-skip: hash-aggregating a block whose (key, col) pairs
        # are mostly unique costs a full hash build and compresses
        # nothing — sample the head slice first and skip the combine
        # when fewer than ~10% of its pairs collapse (high-cardinality
        # corpora).  Correctness is unaffected: the partition kernel
        # sums ``__n`` either way.
        probe_n = 1 << 16
        do_group = True
        if t.num_rows > probe_n * 4:
            head = t.slice(0, probe_n).select([*keys, col])
            g0 = head.group_by([*keys, col]).aggregate([])
            do_group = g0.num_rows < probe_n * 0.9
        if do_group:
            ones = pa.array(np.ones(t.num_rows, np.int64), pa.int64())
            g = pa.table({**{k: t[k] for k in keys}, col: t[col],
                          "__n": ones}) \
                .group_by([*keys, col]).aggregate([("__n", "sum")])
            out = pa.table({**{k: g[k] for k in keys}, col: g[col],
                            "__n": g["__n_sum"]})
        else:
            out = pa.table({**{k: t[k] for k in keys}, col: t[col],
                            "__n": pa.array(
                                np.ones(t.num_rows, np.int64),
                                pa.int64())})
        return _tag_partition_keys(out, keys, n_parts)

    def kernel(g: pa.Table) -> pa.Table:
        return _distinct_partition(g, keys, col, n_rows, n_distinct)

    return ds.map_batches(combine, batch_format="pyarrow",
                          batch_size=None) \
        .groupby("__part", num_partitions=n_parts) \
        .map_groups(kernel, batch_format="pyarrow")
