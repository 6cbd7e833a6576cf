"""Backward as-of join — for every left row, the single right row of
the same key with the greatest timestamp at-or-before the left row's
timestamp (the classic point-in-time enrichment: "state as of this
event").  Ray Data has no native as-of join; this is the documented
composition path for it (map_batches partition tag on a union → one
``groupby().map_groups`` partition kernel), per the brief's
custom-operator ladder (composition before actors before raw tasks).

Semantics (deterministic, total): match = the right row maximizing
(ts, tiebreak) subject to right.ts <= left.ts and equal key; left rows
with no qualifying right row get nulls.  Ties on ts resolve by the
``right_tiebreak`` column (pass a unique id to make the join fully
deterministic — the SQL equivalent is ``ORDER BY ts DESC, tiebreak
DESC LIMIT 1`` in a LEFT JOIN LATERAL, which DuckDB's bare ASOF JOIN
leaves unspecified).  Without a tiebreak, equal-timestamp right rows
resolve by partition arrival order, which is NOT stable across runs.

Scale shape: both sides are hash-partitioned by key (ONE shuffle
total — the sides are unioned first, so left and right rows of a key
land in the same partition), and each partition is resolved by one
vectorized kernel: a lexsort over (key, ts, side, tiebreak) followed
by a running-maximum scan carrying the latest right-row position
forward.  Sorting right rows (side 0) before left rows (side 1) at
equal timestamps makes the bound inclusive, and key-contiguity after
the sort means a key-equality check on the matched row is exact.  No
per-key Python; payload columns move only via Arrow ``take``, so
types (and 64-bit integer exactness) are preserved end-to-end.

Partitioning assumption: one key's rows (both sides together) fit in
one partition — the same assumption sessionize and the clustering
kernels document.  Partition ids come from ``pandas.util.hash_array``
(fixed internal hash key, so deterministic across processes — unlike
Python's per-process-salted ``hash()``), so results are independent
of parallelism; ``tests/test_asof.py`` asserts that.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
    """The dataset's underlying Arrow schema (``Schema.types`` on the
    Ray wrapper can surface Python classes, not pa.DataType)."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for n, t in zip(s.names, s.types):
        if isinstance(t, pa.DataType):
            fields.append(pa.field(n, t))
            continue
        try:
            fields.append(pa.field(n, pa.from_numpy_dtype(np.dtype(t))))
        except (TypeError, pa.ArrowNotImplementedError):
            # pandas extension dtypes (nullable Int64/Int32/boolean)
            # carry their storage dtype; bare object dtype means
            # strings in pandas-block datasets.  Parquet-sourced
            # datasets never reach this branch.
            nd = getattr(t, "numpy_dtype", None)
            fields.append(pa.field(
                n, pa.from_numpy_dtype(nd) if nd is not None
                else pa.string()))
    return pa.schema(fields)


def _key_partition(vals: np.ndarray, n_parts: int) -> np.ndarray:
    """Deterministic partition id per key value (any dtype)."""
    h = pd.util.hash_array(np.asarray(vals), categorize=False)
    return (h % np.uint64(n_parts)).astype(np.int64)


def _norm_key_array(col: pa.ChunkedArray | pa.Array,
                    target: pa.DataType) -> np.ndarray:
    """Key column → the EXACT numpy array the partition tag hashes
    (cast to the left key type first — ``pd.util.hash_array`` is
    dtype- and unit-sensitive, int32 -1 and int64 -1 hash
    differently).  Integer/temporal keys normalize to null-filled
    int64: a single null would otherwise float the WHOLE numpy
    conversion and change every non-null key's hash (null keys never
    match, so where a null row lands is immaterial).  Shared by
    ``_tag_partition`` and the semi-join Bloom prefilter, which MUST
    hash bit-identically to it."""
    col = pc.cast(col, target)
    if pa.types.is_integer(target) or pa.types.is_temporal(target):
        return pc.fill_null(pc.cast(col, pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
    if pa.types.is_floating(target):
        return pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)
    return col.to_numpy(zero_copy_only=False)


def _multi_part_ids(t: pa.Table, keys: list[str],
                    n_parts: int) -> np.ndarray:
    """Deterministic partition id over a COMPOSITE key: per-column
    ``pd.util.hash_array`` (the join family's hash) folded with an
    FNV-prime multiply so distinct tuples scatter even when single
    columns collide.  The first column's hash seeds the fold directly,
    so the single-key cost is exactly one hash pass."""
    h: np.ndarray | None = None
    for c in keys:
        hc = pd.util.hash_array(_norm_key_array(t[c], t[c].type),
                                categorize=False)
        if h is None:
            h = hc
        else:
            with np.errstate(over="ignore"):
                h = pd.util.hash_array(h * np.uint64(1099511628211) ^ hc,
                                       categorize=False)
    assert h is not None, "keys must be non-empty"
    return (h % np.uint64(n_parts)).astype(np.int64)


def _tag_partition_keys(t: pa.Table, keys: list[str],
                        n_parts: int) -> pa.Table:
    """Append a __part tag for a single- or composite-key shuffle
    (no __side — for the grouped-kernel family: windows, grouped
    quantiles, grouped distinct count)."""
    part = _multi_part_ids(t, keys, n_parts)
    return t.append_column("__part", pa.array(part, pa.int64()))


def _composite_heads(kcs: list[np.ndarray], order: np.ndarray,
                     n: int) -> np.ndarray:
    """Segment-head flags after a lexsort: True where ANY key column
    changes from the previous sorted row (equal tuples are adjacent
    after the lexsort, so per-column OR is exact).  Shared by the
    window/quantile/distinct kernels."""
    heads = np.zeros(n, dtype=bool)
    if n:
        heads[0] = True
        for kc in kcs:
            ks = kc[order]
            heads[1:] |= ks[1:] != ks[:-1]
    return heads


def _tag_partition(t: pa.Table, side: int, key_col: str,
                   n_parts: int) -> pa.Table:
    """Append __part/__side for the union-then-shuffle join family
    (key normalization: see ``_norm_key_array``)."""
    col = t[key_col]
    keys = _norm_key_array(col, col.type)
    part = _key_partition(keys, n_parts)
    return t.append_column("__part", pa.array(part, pa.int64())) \
        .append_column("__side", pa.array(
            np.full(t.num_rows, side, dtype=np.int8), pa.int8()))


def _sort_key_ints(col: pa.ChunkedArray) -> np.ndarray:
    """Column → int64 codes that order identically to the values.
    Datetimes stay in their NATIVE unit (both sides were cast to the
    left type at tag time, so units agree; converting to us would
    truncate distinct ns timestamps onto one code and make a
    strictly-later right row look simultaneous).

    Integer columns are normalized ARROW-side: a nullable int64
    column's ``to_numpy`` float64-promotes, collapsing distinct keys
    >= 2^53 onto one value — so nulls are filled with a sentinel in
    int64 space first, then rank-compressed so the null code (-1)
    stays distinct from every real value (including a genuine 0)."""
    t = col.type
    if pa.types.is_integer(t) or pa.types.is_temporal(t):
        iv = pc.fill_null(pc.cast(col, pa.int64()), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        if not col.null_count:
            return iv
        codes = np.unique(iv, return_inverse=True)[1].astype(np.int64)
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        return np.where(valid, codes, np.int64(-1))
    vals = col.to_numpy(zero_copy_only=False)
    if np.issubdtype(vals.dtype, np.datetime64):
        return vals.astype(np.int64)  # raw ticks, no unit conversion
    if np.issubdtype(vals.dtype, np.integer):
        return vals.astype(np.int64, copy=False)
    codes, _ = pd.factorize(vals, sort=True)
    return codes.astype(np.int64, copy=False)


def _asof_partition(g: pa.Table, key: str, ts_col: str,
                    left_cols: list[str], out_cols: list[str],
                    tb_col: str | None) -> pa.Table:
    n = g.num_rows
    kc = _sort_key_ints(g[key])
    t = _sort_key_ints(g[ts_col])
    side = g["__side"].to_numpy(zero_copy_only=False)
    if tb_col is not None:
        # null on left rows (irrelevant there: side orders right rows
        # before left at equal ts regardless of tiebreak)
        tb = pc.fill_null(g[tb_col], 0).to_numpy(zero_copy_only=False)
        if not np.issubdtype(tb.dtype, np.number):
            raise TypeError("right_tiebreak must be a numeric column")
    else:
        tb = np.zeros(n, dtype=np.int8)
    # key asc, ts asc, right (0) before left (1) at equal ts
    # (inclusive <=), tiebreak asc so the running max lands on the
    # highest-tiebreak right row among equal timestamps
    order = np.lexsort((tb, side, t, kc))
    ks, sides = kc[order], side[order]
    rr = np.where(sides == 0, np.arange(n), -1)
    last = np.maximum.accumulate(rr)
    li = np.flatnonzero(sides == 1)
    ml = last[li]
    valid = (ml >= 0) & (ks[np.maximum(ml, 0)] == ks[li])
    left_idx = order[li]
    # invalid matches gather an arbitrary row, then get nulled
    match_idx = order[np.where(valid, ml, 0)]
    take_left = pa.array(left_idx, pa.int64())
    take_match = pa.array(match_idx, pa.int64())
    valid_arr = pa.array(valid)
    cols: dict[str, pa.ChunkedArray | pa.Array] = {
        c: g[c].take(take_left) for c in left_cols}
    for c in out_cols:
        taken = g[c].take(take_match)
        cols[c] = pc.if_else(valid_arr, taken,
                             pa.scalar(None, type=taken.type))
    return pa.table(cols)


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
              left_on: str, left_ts: str, right_cols: list[str],
              right_on: str | None = None, right_ts: str | None = None,
              suffix: str = "_asof", right_tiebreak: str | None = None,
              num_partitions: int | None = None) -> ray.data.Dataset:
    """Backward as-of join: one output row per LEFT row, carrying all
    left columns plus ``<c><suffix>`` for every ``right_cols`` entry
    (null when the key has no right row at-or-before the left ts)."""
    from dedupe_api_ray.utils import shuffle_partitions
    n_parts = shuffle_partitions(num_partitions)
    right_on = right_on or left_on
    right_ts = right_ts or left_ts
    left_schema = _arrow_schema(left)
    left_cols = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    carry = list(dict.fromkeys(
        right_cols + ([right_tiebreak] if right_tiebreak else [])))
    # right payload travels under its OUTPUT name from the start, so
    # shared left/right column names (e.g. both sides having "ts")
    # can never collide in the union schema
    out_names = {c: f"{c}{suffix}" for c in carry}
    clash = [v for v in out_names.values() if v in left_cols]
    if clash:
        raise ValueError(
            f"asof_join output columns {clash} already exist on the "
            f"left side; pass a different suffix")
    right_schema = _arrow_schema(right)
    right_types = dict(zip(right_schema.names, right_schema.types))
    missing = [c for c in carry + [right_on, right_ts]
               if c not in right_types]
    if missing:
        raise ValueError(f"right side lacks columns {missing}")
    union_names = left_cols + [out_names[c] for c in carry]
    union_types = {**left_types,
                   **{out_names[c]: right_types[c] for c in carry}}

    def tag_left(t: pa.Table) -> pa.Table:
        arrs = [t[c] for c in left_cols] + \
            [pa.nulls(t.num_rows, union_types[out_names[c]])
             for c in carry]
        u = pa.table(dict(zip(union_names, arrs)))
        return _tag_partition(u, 1, left_on, n_parts)

    def tag_right(t: pa.Table) -> pa.Table:
        # SQL semantics: a right row with a null key or null ts can
        # never match (key = key / ts <= ts are never true on NULL)
        t = t.filter(pc.and_(pc.is_valid(t[right_on]),
                             pc.is_valid(t[right_ts])))
        arrs = []
        for c in left_cols:
            if c == left_on:
                arrs.append(pc.cast(t[right_on], left_types[c]))
            elif c == left_ts:
                arrs.append(pc.cast(t[right_ts], left_types[c]))
            else:
                arrs.append(pa.nulls(t.num_rows, left_types[c]))
        arrs += [t[c] for c in carry]
        u = pa.table(dict(zip(union_names, arrs)))
        return _tag_partition(u, 0, left_on, n_parts)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))
    out_cols = [out_names[c] for c in right_cols]
    tb_col = out_names[right_tiebreak] if right_tiebreak else None

    def kernel(g: pa.Table) -> pa.Table:
        return _asof_partition(g, left_on, left_ts, left_cols,
                               out_cols, tb_col)

    return unioned.groupby("__part", num_partitions=n_parts) \
        .map_groups(kernel, batch_format="pyarrow")
