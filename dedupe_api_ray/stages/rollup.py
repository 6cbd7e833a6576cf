"""ROLLUP aggregate — ``GROUP BY ROLLUP(k1, k2, ...)``: one output
row set per prefix level (finest → grand total), each row tagged with
the SQL ``GROUPING_ID`` bitmask and rolled-up key columns nulled.

Scale shape: the input shuffles ONCE, at the finest level, with
map-side partial aggregation (Arrow ``group_by`` per batch before the
groupby — the same combiner discipline as the q1/tumbling queries).
Every coarser level then re-aggregates the PREVIOUS level's already-
aggregated output — datasets whose size is bounded by key-combination
cardinality, not input rows — so rollup costs one wide shuffle plus
len(keys) trivial ones, never len(keys) passes over the input.

Aggregates: ``sums`` (exact for integer inputs — convert money to
cents upstream) and an implicit row count ``n``.  Count/sum columns
compose correctly across levels because sum is reassociative; that is
the invariant that makes the cascade exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum


def _partial(t: pa.Table, keys: list[str], sums: dict[str, str],
             count_col: str) -> pa.Table:
    cols = {k: t[k] for k in keys}
    for out, src in sums.items():
        cols[out] = t[src]
    cols[count_col] = pa.array(np.ones(t.num_rows, np.int64))
    g = pa.table(cols).group_by(keys).aggregate(
        [(c, "sum") for c in (*sums, count_col)])
    return pa.table({**{k: g[k] for k in keys},
                     **{c: g[f"{c}_sum"] for c in (*sums, count_col)}})


def rollup_aggregate(ds: ray.data.Dataset, *, keys: list[str],
                     sums: dict[str, str],
                     count_col: str = "n",
                     num_partitions: int | None = None
                     ) -> ray.data.Dataset:
    """``GROUP BY ROLLUP(*keys)`` with SUM aggregates ``{out: src}``
    plus a row count.  Output: key columns (null where rolled up),
    one sum column per entry, ``count_col``, and ``grouping_id`` (the
    SQL bitmask: bit i set ⇔ keys[i] is rolled up; 0 = finest level,
    2**len(keys)-1 = grand total).  SQL parity includes the empty
    input: like ``GROUP BY ROLLUP``, an empty dataset yields exactly
    one grand-total row (null keys, null sums, count 0)."""
    from dedupe_api_ray.stages.asof import _arrow_schema
    from dedupe_api_ray.utils import shuffle_partitions
    if not keys:
        raise ValueError("rollup_aggregate: needs at least one key")
    for c in (*sums, count_col, "grouping_id"):
        if c in keys:
            raise ValueError(f"rollup_aggregate: output column {c!r} "
                             "collides with a key")
    n_parts = shuffle_partitions(num_partitions)
    metric_cols = [*sums, count_col]

    # materialized: it is small (bounded by key-combination
    # cardinality) and every coarser level re-reads it
    finest = ds.map_batches(
        lambda t: _partial(t, keys, sums, count_col),
        batch_format="pyarrow") \
        .groupby(keys, num_partitions=n_parts) \
        .aggregate(*[Sum(c, alias_name=c) for c in metric_cols]) \
        .materialize()

    if finest.count() == 0:
        # SQL ROLLUP over an empty table still emits the grand total.
        # A fully-empty dataset may carry NO schema (e.g. a row filter
        # that dropped everything) — the nulls are untyped then.
        try:
            in_schema = _arrow_schema(ds)

            def _t(c: str) -> pa.DataType:
                return in_schema.field(c).type
        except Exception:
            def _t(c: str) -> pa.DataType:
                return pa.null()
        row: dict[str, pa.Array] = {
            k: pa.nulls(1, _t(k)) for k in keys}
        for out, src in sums.items():
            row[out] = pa.nulls(1, _t(src))
        row[count_col] = pa.array([0], pa.int64())
        row["grouping_id"] = pa.array([(1 << len(keys)) - 1], pa.int64())
        return ray.data.from_arrow(pa.table(row))

    key_types: dict[str, pa.DataType] = {}

    def finish(level: int):
        live = keys[:len(keys) - level]
        gid = sum(1 << i for i in range(len(keys) - level, len(keys)))

        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                cols[k] = t[k] if k in live else \
                    pa.nulls(t.num_rows, key_types[k])
            for c in metric_cols:
                cols[c] = t[c]
            cols["grouping_id"] = pa.array(
                np.full(t.num_rows, gid, np.int64))
            return pa.table(cols)

        return fn

    levels = [finest]
    prev = finest
    for level in range(1, len(keys) + 1):
        live = keys[:len(keys) - level]
        if live:
            nxt = prev.groupby(live, num_partitions=min(n_parts, 4)) \
                .aggregate(*[Sum(c, alias_name=c) for c in metric_cols])
        else:
            # grand total: constant-key groupby (Ray has no global
            # aggregate-to-Dataset); the helper key never reaches the
            # output because finish() copies only keys + metrics.
            # NOTE: over an EMPTY input this yields no rows, where SQL
            # ROLLUP emits one count-0 grand-total row.
            nxt = prev.map_batches(
                lambda t: t.append_column(
                    "__g", pa.array(np.zeros(t.num_rows, np.int64))),
                batch_format="pyarrow") \
                .groupby("__g", num_partitions=1) \
                .aggregate(*[Sum(c, alias_name=c) for c in metric_cols])
        levels.append(nxt)
        prev = nxt

    # key types for null fills come from the finest level's schema
    sch = levels[0].schema()
    for nm, tp in zip(sch.names, sch.types):
        if nm in keys:
            key_types[nm] = tp if isinstance(tp, pa.DataType) \
                else pa.from_numpy_dtype(np.dtype(tp))

    tagged = [lvl.map_batches(finish(i), batch_format="pyarrow")
              for i, lvl in enumerate(levels)]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.union(t)
    return out
