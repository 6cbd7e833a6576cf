"""Interval (range) join — emit one row per (left, right) pair where
the keys match and the left timestamp falls inside the right row's
``[start, end]`` interval, both ends inclusive (SQL: ``JOIN ... ON
key = key AND ts BETWEEN start AND end``).  Ray Data has no native
range join; like the as-of join this is the documented composition
path (map_batches partition tag on a union → one
``groupby().map_groups`` partition kernel).

Scale shape: both sides are hash-partitioned by key (ONE shuffle —
the sides are unioned first), and each partition is resolved by one
vectorized kernel with NO per-key Python and NO key-cross-product:
intervals are sorted by (key, start) and each left row binary-searches
the contiguous candidate band ``start ∈ [ts - W, ts]`` of its key,
where ``W = max(end - start)`` over the partition's intervals — every
interval containing ts must start in that band, so a final
``end >= ts`` filter over the expanded candidates is exact.  The
(key, start-rank) pair is packed into one int64 so a single global
``np.searchsorted`` answers all rows at once.  Work is
O((n + output + slack) log n) where slack is candidates whose end
falls short — bounded by interval-width skew, not by key skew.

Partitioning assumption: one key's rows (both sides together) fit in
one partition — the same assumption the as-of join, sessionize and
the clustering kernels document.  Partition ids come from
``pandas.util.hash_array`` (deterministic across processes), so
results are independent of parallelism; ``tests/test_ranges.py``
asserts that.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dedupe_api_ray.stages.asof import _arrow_schema, _tag_partition

_END = "__iv_end"


def _col_i64(col: pa.ChunkedArray) -> np.ndarray:
    """Timestamp/integer column → exact int64 in the native unit.
    Nulls → 0, which is safe ONLY because the tag functions filter
    null key/ts/start/end rows up front (SQL: a NULL operand in
    ``ts BETWEEN start AND end`` never matches); the one remaining
    null source is the _END slot of left rows, never read."""
    return pc.fill_null(pc.cast(col, pa.int64()), 0) \
        .to_numpy(zero_copy_only=False)


def _interval_partition(g: pa.Table, key: str, ts_col: str,
                        left_cols: list[str], out_cols: list[str]
                        ) -> pa.Table:
    n = g.num_rows
    if n > 2 ** 31:
        raise ValueError(
            "interval_join partition exceeds 2^31 rows; raise "
            "num_partitions (the packed key×rank search key would "
            "overflow int64)")
    kv = g[key].to_numpy(zero_copy_only=False)
    kc, _ = pd.factorize(kv, sort=False)  # label values, never ordered
    kc = kc.astype(np.int64, copy=False)
    tall = _col_i64(g[ts_col])  # left ts / right start (both null-free)
    side = g["__side"].to_numpy(zero_copy_only=False)
    ridx = np.flatnonzero(side == 0)
    lidx = np.flatnonzero(side == 1)
    if len(ridx) and len(lidx):
        ik, istart = kc[ridx], tall[ridx]
        iend = _col_i64(g[_END])[ridx]
        qk, qt = kc[lidx], tall[lidx]
        width = iend - istart
        w = max(int(width.max()), 0)  # end<start rows never match
        order_i = np.lexsort((istart, ik))
        ik_s, istart_s = ik[order_i], istart[order_i]
        iend_s = iend[order_i]
        # dense time ranks make key*U + rank collision-free in int64
        uniq = np.unique(np.concatenate([istart_s, qt, qt - w]))
        u = np.int64(len(uniq) + 1)
        comp_i = ik_s * u + np.searchsorted(uniq, istart_s)
        hi = np.searchsorted(
            comp_i, qk * u + np.searchsorted(uniq, qt), side="right")
        lo = np.searchsorted(
            comp_i, qk * u + np.searchsorted(uniq, qt - w), side="left")
        cnt = hi - lo
        tot = int(cnt.sum())
        rep = np.repeat(np.arange(len(lidx)), cnt)
        cum = np.concatenate([[0], np.cumsum(cnt[:-1])])
        ci = np.arange(tot) - np.repeat(cum, cnt) + np.repeat(lo, cnt)
        keep = iend_s[ci] >= qt[rep]  # start<=ts is implied by hi
        take_left = lidx[rep[keep]]
        take_right = ridx[order_i[ci[keep]]]
    else:
        take_left = take_right = np.empty(0, dtype=np.int64)
    tl = pa.array(take_left, pa.int64())
    tr = pa.array(take_right, pa.int64())
    cols = {c: g[c].take(tl) for c in left_cols}
    for c in out_cols:
        cols[c] = g[c].take(tr)
    return pa.table(cols)


def interval_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
                  left_on: str, left_ts: str, right_start: str,
                  right_end: str, right_cols: list[str],
                  right_on: str | None = None, suffix: str = "_iv",
                  num_partitions: int | None = None) -> ray.data.Dataset:
    """Inner range join: one output row per (left row, right row)
    pair with equal keys and ``right_start <= left_ts <= right_end``
    (inclusive), carrying all left columns plus ``<c><suffix>`` for
    every ``right_cols`` entry."""
    from dedupe_api_ray.utils import shuffle_partitions
    n_parts = shuffle_partitions(num_partitions)
    right_on = right_on or left_on
    left_schema = _arrow_schema(left)
    left_cols = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    out_names = {c: f"{c}{suffix}" for c in right_cols}
    clash = [v for v in out_names.values() if v in left_cols]
    if clash:
        raise ValueError(
            f"interval_join output columns {clash} already exist on "
            f"the left side; pass a different suffix")
    right_schema = _arrow_schema(right)
    right_types = dict(zip(right_schema.names, right_schema.types))
    missing = [c for c in right_cols + [right_on, right_start, right_end]
               if c not in right_types]
    if missing:
        raise ValueError(f"right side lacks columns {missing}")
    ts_type = left_types[left_ts]
    union_names = left_cols + [out_names[c] for c in right_cols] + [_END]
    union_types = {**left_types,
                   **{out_names[c]: right_types[c] for c in right_cols},
                   _END: ts_type}

    def tag_left(t: pa.Table) -> pa.Table:
        # inner join: a null key or null ts can never match — drop now
        t = t.filter(pc.and_(pc.is_valid(t[left_on]),
                             pc.is_valid(t[left_ts])))
        arrs = [t[c] for c in left_cols] + \
            [pa.nulls(t.num_rows, union_types[out_names[c]])
             for c in right_cols] + [pa.nulls(t.num_rows, ts_type)]
        u = pa.table(dict(zip(union_names, arrs)))
        return _tag_partition(u, 1, left_on, n_parts)

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.and_(pc.is_valid(t[right_on]), pc.is_valid(t[right_start])),
            pc.is_valid(t[right_end])))
        arrs = []
        for c in left_cols:
            if c == left_on:
                arrs.append(pc.cast(t[right_on], left_types[c]))
            elif c == left_ts:
                # interval start rides the left ts slot (null-free)
                arrs.append(pc.cast(t[right_start], ts_type))
            else:
                arrs.append(pa.nulls(t.num_rows, left_types[c]))
        arrs += [t[c] for c in right_cols]
        arrs.append(pc.cast(t[right_end], ts_type))
        u = pa.table(dict(zip(union_names, arrs)))
        return _tag_partition(u, 0, left_on, n_parts)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))
    out_cols = [out_names[c] for c in right_cols]

    def kernel(g: pa.Table) -> pa.Table:
        return _interval_partition(g, left_on, left_ts, left_cols,
                                   out_cols)

    return unioned.groupby("__part", num_partitions=n_parts) \
        .map_groups(kernel, batch_format="pyarrow")
