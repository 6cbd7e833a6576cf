"""Per-key window functions — ``row_number`` / ``lag`` / running sum
over ``(PARTITION BY key ORDER BY cols)``, the SQL window family Ray
Data has no native operator for.  The log-pipeline workhorses:
per-user event sequencing, running totals, previous-row deltas.

Scale shape: ONE hash shuffle by the partition key (the same
deterministic ``pandas.util.hash_array`` tag as the as-of/interval/
semi join family), then one vectorized kernel per partition — a
single ``np.lexsort`` over (key, order columns) and pure segment
arithmetic on top of it:

- row_number  = arange − segment-head index + 1
- running sum = cumsum − cumsum[head] + x[head]  (int64-exact when the
  source column is integral — pre-convert money to cents upstream)
- lag         = Arrow ``take`` of the previous sorted position,
  nulled at segment heads via ``if_else`` (no Python shift loop)

No per-key Python anywhere; one key's rows never split across
partitions, so output is independent of block layout and parallelism
(tested in ``tests/test_windows.py``).

Null policy (checked loudly, not silently mis-sorted): the partition
key and every order column must be non-null — SQL window ORDER BY
has an implementation-defined null placement that a hash-partitioned
engine cannot reproduce portably, so a null there raises instead of
guessing.  ``lag``/``cumsum`` SOURCE columns may be anything Arrow
``take`` carries (lag) / any non-null numeric (cumsum).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from dedupe_api_ray.stages.asof import (_arrow_schema, _composite_heads,
                                        _sort_key_ints,
                                        _tag_partition_keys)


def _window_partition(g: pa.Table, keys: list[str], order_by: list[str],
                      out_cols: list[str], row_number: str | None,
                      lag: dict[str, str], cumsum: dict[str, str],
                      rank: str | None = None,
                      dense_rank: str | None = None,
                      lead: dict[str, str] | None = None,
                      ntile: dict[str, int] | None = None,
                      percent_rank: str | None = None) -> pa.Table:
    lead = lead or {}
    ntile = ntile or {}
    n = g.num_rows
    for c in (*keys, *order_by):
        if g[c].null_count:
            raise ValueError(
                f"window_over: column {c!r} has nulls; partition/order "
                "columns must be non-null (SQL null ordering is not "
                "portable) — fill or filter upstream")
        # a float NaN passes the null check but factorizes to code -1
        # and would silently sort FIRST, diverging from SQL engines
        # that place NaN last — same loud contract as grouped_quantiles
        if pa.types.is_floating(g[c].type) and \
                pc.any(pc.is_nan(g[c])).as_py():
            raise ValueError(
                f"window_over: column {c!r} contains NaN; SQL NaN "
                "ordering is not portable — fill or filter upstream")
    kcs = [_sort_key_ints(g[k]) for k in keys]
    ords = [_sort_key_ints(g[c]) for c in order_by]
    # np.lexsort sorts by the LAST key first → keys are primary
    # (left-to-right), then order_by columns left-to-right
    order = np.lexsort((*reversed(ords), *reversed(kcs)))
    heads = _composite_heads(kcs, order, n)
    starts = np.flatnonzero(heads)
    seg_len = np.diff(np.r_[starts, n])
    base = np.repeat(starts, seg_len)  # segment-head index, per row
    take = pa.array(order, pa.int64())
    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        c: g[c].take(take) for c in out_cols}
    if row_number is not None:
        cols[row_number] = pa.array(np.arange(n) - base + 1, pa.int64())
    if rank is not None or dense_rank is not None \
            or percent_rank is not None:
        # tie-group head: new key OR any order column changed
        chg = heads.copy()
        for oc in ords:
            os_ = oc[order]
            if n:
                chg[1:] |= os_[1:] != os_[:-1]
        if rank is not None or percent_rank is not None:
            th = np.maximum.accumulate(
                np.where(chg, np.arange(n), -1))
            rk = th - base + 1
            if rank is not None:
                cols[rank] = pa.array(rk, pa.int64())
            if percent_rank is not None:
                # SQL PERCENT_RANK() = (rank-1)/(n-1), 0 for n == 1 —
                # an exact IEEE division of two small ints, replayed
                # identically by any SQL oracle
                L = np.repeat(seg_len, seg_len)
                pr = np.where(L > 1, (rk - 1) / np.maximum(L - 1, 1), 0.0)
                cols[percent_rank] = pa.array(pr, pa.float64())
        if dense_rank is not None:
            d = np.cumsum(chg)
            cols[dense_rank] = pa.array(d - d[base] + 1, pa.int64())
    for out, nt in ntile.items():
        # SQL NTILE(N): first (n % N) buckets get ceil(n/N) rows, the
        # rest floor(n/N) — pure segment arithmetic per row
        L = np.repeat(seg_len, seg_len)
        pos = np.arange(n) - base  # 0-based within segment
        q, r = L // nt, L % nt
        cut = r * (q + 1)
        small = pos < cut
        vals = np.where(small, pos // np.maximum(q + 1, 1),
                        r + (pos - cut) // np.maximum(q, 1)) + 1
        cols[out] = pa.array(vals.astype(np.int64), pa.int64())
    for out, src in cumsum.items():
        col = g[src]
        if col.null_count:
            raise ValueError(f"window_over: cumsum source {src!r} has "
                             "nulls; fill upstream")
        if pa.types.is_floating(col.type) and \
                pc.any(pc.is_nan(col)).as_py():
            raise ValueError(f"window_over: cumsum source {src!r} "
                             "contains NaN; fill upstream")
        x = col.take(take).to_numpy(zero_copy_only=False)
        if not np.issubdtype(x.dtype, np.number):
            raise TypeError(f"window_over: cumsum source {src!r} is "
                            f"not numeric ({x.dtype})")
        c = np.cumsum(x)
        run = c - c[base] + x[base] if n else c
        cols[out] = pa.array(run)
    for out, src in lag.items():
        src_sorted = g[src].take(take)
        prev = np.maximum(np.arange(n) - 1, 0)
        taken = src_sorted.take(pa.array(prev, pa.int64()))
        cols[out] = pc.if_else(pa.array(~heads), taken,
                               pa.scalar(None, type=taken.type))
    for out, src in lead.items():
        src_sorted = g[src].take(take)
        nxt = np.minimum(np.arange(n) + 1, max(n - 1, 0))
        tails = np.r_[heads[1:], True] if n else heads  # segment last row
        taken = src_sorted.take(pa.array(nxt, pa.int64()))
        cols[out] = pc.if_else(pa.array(~tails), taken,
                               pa.scalar(None, type=taken.type))
    return pa.table(cols)


def window_over(ds: ray.data.Dataset, *, partition_by: str | list[str],
                order_by: list[str], row_number: str | None = None,
                lag: dict[str, str] | None = None,
                cumsum: dict[str, str] | None = None,
                rank: str | None = None,
                dense_rank: str | None = None,
                lead: dict[str, str] | None = None,
                ntile: dict[str, int] | None = None,
                percent_rank: str | None = None,
                num_partitions: int | None = None) -> ray.data.Dataset:
    """Append window columns computed over
    ``PARTITION BY partition_by ORDER BY *order_by``.  ``partition_by``
    is one column name or a list (composite key, hashed per-column
    and folded).  Ties beyond the given order columns do not occur
    when the last order column is unique — pass a unique id last for
    fully deterministic output.

    ``row_number``: output column name for the 1-based position.
    ``rank`` / ``dense_rank``: SQL RANK() / DENSE_RANK() — unlike
    row_number these are deterministic even when order_by has ties.
    ``lag`` / ``lead``: {out_col: src_col} — previous / next row's
    value, null at segment heads / tails.
    ``cumsum``: {out_col: src_col} — inclusive running sum
    (``ROWS UNBOUNDED PRECEDING``), exact for integer sources.
    ``ntile``: {out_col: N} — SQL NTILE(N) bucket 1..N (the
    train/eval-split primitive); position-based, so pass a unique
    final order column for deterministic output.
    ``percent_rank``: output column for SQL PERCENT_RANK() =
    (rank-1)/(n-1), 0.0 for single-row partitions; tie-aware.
    Output carries every input column plus the window columns.
    """
    from dedupe_api_ray.utils import shuffle_partitions
    keys = [partition_by] if isinstance(partition_by, str) \
        else list(partition_by)
    if not keys:
        raise ValueError("window_over: partition_by is empty")
    lag = dict(lag or {})
    lead = dict(lead or {})
    cumsum = dict(cumsum or {})
    ntile = dict(ntile or {})
    for out, nt in ntile.items():
        if not isinstance(nt, int) or nt < 1:
            raise ValueError(f"window_over: ntile[{out!r}] must be a "
                             f"positive int, got {nt!r}")
    named = [c for c in (row_number, rank, dense_rank, percent_rank)
             if c is not None]
    if not named and not lag and not lead and not cumsum and not ntile:
        raise ValueError("window_over: nothing to compute")
    n_parts = shuffle_partitions(num_partitions)
    schema = _arrow_schema(ds)
    out_cols = list(schema.names)
    clash = [c for c in (*named, *lag, *lead, *cumsum, *ntile)
             if c in out_cols]
    if clash:
        raise ValueError(f"window_over: output columns {clash} already "
                         "exist on the input")
    for src in (*keys, *lag.values(), *lead.values(),
                *cumsum.values(), *order_by):
        if src not in out_cols:
            raise ValueError(f"window_over: no such column {src!r}")

    def tag(t: pa.Table) -> pa.Table:
        return _tag_partition_keys(t.select(out_cols), keys, n_parts)

    def kernel(g: pa.Table) -> pa.Table:
        return _window_partition(g, keys, order_by, out_cols,
                                 row_number, lag, cumsum, rank,
                                 dense_rank, lead, ntile, percent_rank)

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__part", num_partitions=n_parts) \
        .map_groups(kernel, batch_format="pyarrow")
