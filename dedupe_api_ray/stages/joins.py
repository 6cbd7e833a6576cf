"""General LEFT / FULL OUTER JOIN and a generic grouped-aggregate
surface.

The engine already has inner join (Ray ``Dataset.join``), semi/anti
(+Bloom), as-of, interval, rollup and windows — but a training-data
user enriching documents with OPTIONAL metadata reaches for LEFT JOIN
first (VERDICT r4 missing item 2), and "group by these keys, give me
count/sum/mean/min/max" should not require composing rollup.

Scale shape (the union-then-shuffle join family, same as semi/asof):

- ``left_join``: both sides tag a deterministic composite-key
  partition id (``asof._multi_part_ids`` — pandas stable hashing, so
  results are independent of parallelism), union, ONE shuffle, and a
  vectorized partition kernel: joint key-grouping via lexsort +
  segment heads (no int-code arithmetic that could overflow on wide
  composites), per-left-row match counts via ``bincount``, matched
  right rows gathered with repeat/segment arithmetic — no per-key
  Python.  SQL semantics: a null in ANY key column never matches
  (those left rows pass through with null right columns); duplicate
  right matches multiply the left row, exactly like SQL.

- ``grouped_agg``: per-batch PARTIAL aggregation with one Arrow
  ``group_by`` (the combiner-before-shuffle rule — heavily repeated
  keys collapse map-side), one hash shuffle by key, and a finish
  kernel that re-aggregates partials (sum-of-sums, min-of-mins,
  sum-of-counts; mean = sum/count at finish).  Null keys form their
  own group, per SQL GROUP BY.

Partitioning assumption (documented like the siblings): one join
key's rows — or one group's partials — fit in a partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dedupe_api_ray.stages.asof import (_arrow_schema, _composite_heads,
                                        _multi_part_ids, _norm_key_array,
                                        _sort_key_ints)


def _group_ids(g: pa.Table, keys: list[str]) -> np.ndarray:
    """Joint group id per row over a composite key (−1 where any key
    column is null — SQL join keys never match on null).  Exact for
    any dtype mix: per-column order codes, one lexsort, segment heads."""
    n = g.num_rows
    kcs = [_sort_key_ints(g[k]) for k in keys]
    order = np.lexsort(tuple(reversed(kcs)))
    heads = _composite_heads(kcs, order, n)
    gid_sorted = np.cumsum(heads) - 1
    gid = np.empty(n, dtype=np.int64)
    gid[order] = gid_sorted
    for k in keys:
        if g[k].null_count:
            valid = pc.is_valid(g[k]).to_numpy(zero_copy_only=False)
            gid = np.where(valid, gid, np.int64(-1))
    return gid


def _left_join_partition(g: pa.Table, keys: list[str],
                         left_cols: list[str], right_cols: list[str],
                         right_types: dict[str, pa.DataType],
                         full: bool = False) -> pa.Table:
    side = g["__side"].to_numpy(zero_copy_only=False)
    gid = _group_ids(g, keys)
    lidx = np.flatnonzero(side == 1)
    ridx = np.flatnonzero((side == 0) & (gid >= 0))
    n_groups = int(gid.max()) + 1 if len(gid) else 0
    # right rows grouped by gid: sort once, segment starts via bincount
    rorder = ridx[np.argsort(gid[ridx], kind="stable")]
    cnt = np.bincount(gid[ridx], minlength=max(n_groups, 1))
    seg = np.concatenate(([0], np.cumsum(cnt)))[:-1]
    lgid = gid[lidx]
    matched = lgid >= 0
    reps = np.where(matched, cnt[np.where(matched, lgid, 0)], 0)
    # matched left rows expand by their match count; unmatched emit one
    out_reps = np.maximum(reps, 1)
    l_take = np.repeat(lidx, out_reps)
    total = int(out_reps.sum())
    excl = np.concatenate(([0], np.cumsum(out_reps)))[:-1]
    within = np.arange(total, dtype=np.int64) - np.repeat(excl, out_reps)
    has_match = np.repeat(reps > 0, out_reps)
    r_take = np.where(
        has_match,
        np.repeat(np.where(matched, seg[np.where(matched, lgid, 0)], 0),
                  out_reps) + within,
        0)
    lt = pa.array(l_take, pa.int64())
    out = {c: g[c].take(lt) for c in left_cols}
    if len(rorder):
        rt = pa.array(rorder[r_take], pa.int64())
        hm = pa.array(has_match)
        for c in right_cols:
            out[c] = pc.if_else(hm, g[c].take(rt),
                                pa.scalar(None, right_types[c]))
    else:
        for c in right_cols:
            out[c] = pa.nulls(total, right_types[c])
    res = pa.table(out)
    if not full:
        return res
    # FULL OUTER: additionally emit right rows no left row matched —
    # (a) valid-key right rows in groups with zero left rows, (b)
    # null-key right rows (SQL emits them unmatched).  The key columns
    # carry the right keys (tag_right already wrote them into the
    # shared key columns = SQL USING/COALESCE semantics); non-key left
    # columns were tagged null.
    left_in_group = np.zeros(max(n_groups, 1), dtype=bool)
    if matched.any():
        left_in_group[lgid[matched]] = True
    un_valid = ridx[~left_in_group[gid[ridx]]] if len(ridx) else ridx
    un_null = np.flatnonzero((side == 0) & (gid < 0))
    un = np.concatenate((un_valid, un_null))
    if not len(un):
        return res
    ut = pa.array(un, pa.int64())
    extra = pa.table({c: g[c].take(ut) for c in left_cols + right_cols})
    return pa.concat_tables([res, extra]) if res.num_rows else extra


def left_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
              on: str | list[str], right_on: str | list[str] | None = None,
              right_cols: list[str] | None = None,
              num_partitions: int | None = None,
              _full: bool = False) -> ray.data.Dataset:
    """SQL LEFT OUTER JOIN: every left row, enriched with the matching
    right rows' ``right_cols`` (default: all non-key right columns),
    nulls where no match; composite keys supported; null keys never
    match.  One hash shuffle total."""
    from dedupe_api_ray.utils import shuffle_partitions
    keys = [on] if isinstance(on, str) else list(on)
    rkeys = keys if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    if len(rkeys) != len(keys):
        raise ValueError("left_join: on/right_on length mismatch")
    n_parts = shuffle_partitions(num_partitions)
    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    left_cols = list(lschema.names)
    if right_cols is None:
        right_cols = [c for c in rschema.names if c not in rkeys]
    clash = set(right_cols) & set(left_cols)
    if clash:
        raise ValueError(f"left_join: right columns {sorted(clash)} "
                         "collide with left columns — rename upstream "
                         "or pass right_cols")
    key_types = {k: lschema.field(k).type for k in keys}
    right_types = {c: rschema.field(c).type for c in right_cols}
    all_cols = left_cols + right_cols

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in left_cols}
        for c in right_cols:
            cols[c] = pa.nulls(t.num_rows, right_types[c])
        out = pa.table(cols)
        part = _multi_part_ids(out, keys, n_parts)
        return out.append_column("__part", pa.array(part, pa.int64())) \
            .append_column("__side", pa.array(
                np.ones(t.num_rows, np.int8), pa.int8()))

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {}
        for k, rk in zip(keys, rkeys):
            cols[k] = pc.cast(t[rk], key_types[k])
        for c in left_cols:
            if c not in cols:
                cols[c] = pa.nulls(t.num_rows, lschema.field(c).type)
        for c in right_cols:
            cols[c] = t[c]
        out = pa.table({c: cols[c] for c in all_cols})
        part = _multi_part_ids(out, keys, n_parts)
        return out.append_column("__part", pa.array(part, pa.int64())) \
            .append_column("__side", pa.array(
                np.zeros(t.num_rows, np.int8), pa.int8()))

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    def kernel(g: pa.Table) -> pa.Table:
        return _left_join_partition(g, keys, left_cols, right_cols,
                                    right_types, full=_full)

    return unioned.groupby("__part", num_partitions=n_parts) \
        .map_groups(kernel, batch_format="pyarrow")


def full_outer_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
                    on: str | list[str],
                    right_on: str | list[str] | None = None,
                    right_cols: list[str] | None = None,
                    num_partitions: int | None = None) -> ray.data.Dataset:
    """SQL FULL OUTER JOIN with USING/COALESCE key semantics: every
    left row (nulls where no right match, multiplied by duplicate
    matches) PLUS every unmatched right row (its keys in the shared
    key columns, null left columns; null-key right rows emit
    unmatched, like SQL).  Same one-shuffle shape as ``left_join``."""
    return left_join(left, right, on=on, right_on=right_on,
                     right_cols=right_cols, num_partitions=num_partitions,
                     _full=True)


# ---------------------------------------------------------------------------
# Generic grouped aggregate
# ---------------------------------------------------------------------------

_AGG_FNS = ("sum", "min", "max", "count", "mean")


def _partial_spec(aggs: dict[str, tuple[str, str]]
                  ) -> list[tuple[str, str, str]]:
    """(partial column name, source column or '*', arrow partial op)
    per hidden partial; mean expands to sum + count."""
    parts: list[tuple[str, str, str]] = []
    for out, (src, fn) in aggs.items():
        if fn == "mean":
            parts.append((f"__{out}__sum", src, "sum"))
            parts.append((f"__{out}__cnt", src, "count"))
        elif fn == "count":
            parts.append((f"__{out}__cnt", src,
                          "count_all" if src == "*" else "count"))
        else:
            parts.append((f"__{out}__{fn}", src, fn))
    return parts


def grouped_agg(ds: ray.data.Dataset, *, keys: str | list[str],
                aggs: dict[str, tuple[str, str]],
                num_partitions: int | None = None) -> ray.data.Dataset:
    """``GROUP BY keys`` with named aggregates ``{out: (src, fn)}``,
    fn in {sum, min, max, count, mean}; ``("*", "count")`` is
    ``COUNT(*)`` (counts every row), ``(col, "count")`` counts
    non-null values, per SQL.  Map-side partial aggregation, one
    shuffle, vectorized finish; composite keys supported; null keys
    group together (SQL GROUP BY semantics)."""
    from dedupe_api_ray.utils import shuffle_partitions
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if not key_list:
        raise ValueError("grouped_agg: key list is empty")
    for out, (src, fn) in aggs.items():
        if fn not in _AGG_FNS:
            raise ValueError(f"grouped_agg: unknown fn {fn!r} for {out!r}")
        if out in key_list:
            raise ValueError(f"grouped_agg: output {out!r} collides "
                             "with a key")
        if src == "*" and fn != "count":
            raise ValueError("grouped_agg: '*' source only with count")
    n_parts = shuffle_partitions(num_partitions)
    parts = _partial_spec(aggs)

    def combine(t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in key_list}
        specs = []
        for name, src, op in parts:
            if op == "count_all":
                cols[name] = pa.array(np.ones(t.num_rows, np.int64))
                specs.append((name, "sum"))
            else:
                cols[name] = t[src]
                specs.append((name, op))
        g = pa.table(cols).group_by(key_list, use_threads=False) \
            .aggregate(specs)
        out = {k: g[k] for k in key_list}
        for (name, _, op), (sname, sop) in zip(parts, specs):
            out[name] = g[f"{sname}_{sop}"]
        res = pa.table(out)
        from dedupe_api_ray.stages.asof import _tag_partition_keys
        return _tag_partition_keys(res, key_list, n_parts)

    # finish ops: counts re-sum; min/max/sum fold with themselves
    finish_ops = [(name, "sum" if op in ("count", "count_all") else op)
                  for name, _, op in parts]

    def kernel(g: pa.Table) -> pa.Table:
        gg = g.group_by(key_list, use_threads=False).aggregate(finish_ops)
        out = {k: gg[k] for k in key_list}
        done: dict[str, pa.ChunkedArray] = {
            name: gg[f"{name}_{op}"] for name, op in finish_ops}
        for o, (src, fn) in aggs.items():
            if fn == "mean":
                s = pc.cast(done[f"__{o}__sum"], pa.float64())
                c = pc.cast(done[f"__{o}__cnt"], pa.float64())
                out[o] = pc.if_else(pc.greater(c, 0), pc.divide(s, c),
                                    pa.scalar(None, pa.float64()))
            elif fn == "count":
                out[o] = pc.cast(done[f"__{o}__cnt"], pa.int64())
            else:
                out[o] = done[f"__{o}__{fn}"]
        return pa.table(out)

    # batch_size=None: combine per whole block — the per-1024-row
    # default would pay an Arrow hash-agg per tiny batch and collapse
    # almost nothing (same lesson as grouped_distinct_count)
    return ds.map_batches(combine, batch_format="pyarrow",
                          batch_size=None) \
        .groupby("__part", num_partitions=n_parts) \
        .map_groups(kernel, batch_format="pyarrow")
