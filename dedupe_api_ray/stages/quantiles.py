"""Exact distributed quantiles (order statistics) without a sort
shuffle.

``exact_quantiles(ds, col, qs)`` returns, for each q, the rank
``k = ceil(q * N)`` order statistic (1-based, nulls excluded) — the
unambiguous discrete quantile an oracle can replay with
``row_number() OVER (ORDER BY col)``.

Scale shape (selection, not sorting): values map through an
ORDER-PRESERVING bijection into uint64 key space (IEEE-754 sign-flip
trick for floats, sign-bit XOR for ints), then

1. one ``map_batches`` pass builds per-batch partial histograms over
   the top 16 key bits (<= 65,536 buckets), merged by a tiny groupby —
   the driver sees at most 65,536 count rows, never data rows;
2. the driver walks the cumulative counts to locate each target
   rank's bucket and residual rank;
3. if the candidate buckets still hold more than ``collect_cap`` rows,
   the histogram pass repeats over the NEXT 16 bits restricted to
   those buckets (each pass narrows candidates ~65,536x; after the
   fourth level the bucket IS the exact key, so the value is known
   without collecting anything);
4. one final filtered pass collects only candidate-bucket values
   (count known in advance from the histogram, bounded by
   ``collect_cap``) and picks each residual rank driver-side.

Typical cost: two streaming passes over the column (histogram +
collect) regardless of N — vs a full all-to-all shuffle for
``ds.sort``.  Heavily duplicated values cannot blow up the collect:
a bucket of one repeated key resolves arithmetically at level 0.

NaN values raise loudly (their IEEE ordering is not SQL-portable);
nulls are excluded from ranks, matching SQL aggregate semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_MSB = np.uint64(1 << 63)


def _to_keys(vals: np.ndarray) -> np.ndarray:
    """Order-preserving map into uint64 (ascending value ⇒ ascending
    key)."""
    if np.issubdtype(vals.dtype, np.floating):
        f = np.ascontiguousarray(vals, dtype=np.float64)
        if np.isnan(f).any():
            raise ValueError("exact_quantiles: NaN values present — "
                             "filter them upstream (NaN has no portable "
                             "sort position)")
        b = f.view(np.uint64)
        neg = (b & _MSB) != 0
        return np.where(neg, ~b, b | _MSB)
    if np.issubdtype(vals.dtype, np.integer):
        return vals.astype(np.int64).view(np.uint64) ^ _MSB
    if np.issubdtype(vals.dtype, np.datetime64):
        # ticks order identically to instants (unit is uniform within
        # a column)
        return vals.astype(np.int64).view(np.uint64) ^ _MSB
    raise TypeError(f"exact_quantiles: unsupported dtype {vals.dtype}")


def _from_key(key: int, floating: bool) -> float | int:
    k = np.uint64(key)
    if floating:
        b = (k ^ _MSB) if (k & _MSB) else ~k
        return float(np.array([b], np.uint64).view(np.float64)[0])
    return int(np.array([k ^ _MSB], np.uint64).view(np.int64)[0])


def _column_keys(t: pa.Table, col: str) -> np.ndarray:
    vals = pc.drop_null(t[col]).to_numpy(zero_copy_only=False)
    return _to_keys(vals) if len(vals) else np.zeros(0, np.uint64)


def _hist_pass(ds: ray.data.Dataset, col: str, shift: int,
               prefixes: np.ndarray | None,
               n_parts: int) -> dict[int, int]:
    """Merged histogram {bucket: count} over key >> shift, restricted
    to rows whose key >> (shift+16) is in ``prefixes`` (sorted).

    Shape: one dense ``np.bincount`` per BLOCK (``batch_size=None`` —
    zero rebatching; bincount is O(rows + bins) with no sort, where
    the old per-1024-row ``np.unique`` paid a sort per batch), emitted
    sparse (<= 65,536 rows per surviving prefix); a narrow map-only
    combiner folds ~64 partials per task; the driver adds up what
    remains with one ``np.add.at``.  No groupby barrier anywhere —
    the old tiny-merge shuffle cost a full stage turnaround per
    refinement level."""
    npref = len(prefixes) if prefixes is not None else 1
    nbins = npref << 16
    low16 = np.uint64(0xFFFF)

    def partial(t: pa.Table) -> pa.Table:
        k = _column_keys(t, col)
        if prefixes is not None and len(k):
            p = k >> np.uint64(shift + 16)
            pos = np.minimum(np.searchsorted(prefixes, p), npref - 1)
            sel = prefixes[pos] == p
            k, pos = k[sel], pos[sel]
            # local slot: (prefix position << 16) | low 16 key bits
            idx = (pos.astype(np.int64) << 16) \
                | ((k >> np.uint64(shift)) & low16).astype(np.int64)
        else:
            # first level: shift == 48, so key >> shift < 2^16
            idx = (k >> np.uint64(shift)).astype(np.int64)
        cnt = np.bincount(idx, minlength=nbins) if len(idx) \
            else np.zeros(0, np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"idx": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    def combine(t: pa.Table) -> pa.Table:
        cnt = np.zeros(nbins, np.int64)
        np.add.at(cnt, t["idx"].to_numpy(zero_copy_only=False),
                  t["n"].to_numpy(zero_copy_only=False))
        nz = np.flatnonzero(cnt)
        return pa.table({"idx": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=None) \
        .map_batches(combine, batch_format="pyarrow",
                     batch_size=1 << 22)
    total = np.zeros(nbins, np.int64)
    for t in agg.iter_batches(batch_format="pyarrow",
                              batch_size=1 << 22):
        np.add.at(total, t["idx"].to_numpy(zero_copy_only=False),
                  t["n"].to_numpy(zero_copy_only=False))
    nz = np.flatnonzero(total)
    if prefixes is not None:
        buckets = (prefixes[nz >> 16] << np.uint64(16)) \
            | (nz & 0xFFFF).astype(np.uint64)
    else:
        buckets = nz.astype(np.uint64)
    return {int(b): int(total[i]) for i, b in zip(nz, buckets)}


def exact_quantiles(ds: ray.data.Dataset, col: str, qs: list[float], *,
                    collect_cap: int = 5_000_000,
                    num_partitions: int | None = None) -> pa.Table:
    """Small driver-side result table ``(q, value)`` — the exact
    rank-``ceil(q*N)`` order statistics of ``col`` (nulls excluded).
    Requires 0 < q <= 1."""
    from dedupe_api_ray.utils import shuffle_partitions
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("exact_quantiles: each q must be in (0, 1]")
    n_parts = shuffle_partitions(num_partitions)
    from dedupe_api_ray.stages.asof import _arrow_schema
    col_type = _arrow_schema(ds).field(col).type
    floating = pa.types.is_floating(col_type)
    if pa.types.is_time(col_type):
        # time32/time64 reach numpy as datetime.time OBJECTS, which
        # the key transform cannot view as ticks — fail loudly here,
        # not inside a shuffled task
        raise TypeError("exact_quantiles: time32/time64 columns are "
                        "not supported; cast to integer ticks upstream")
    # timestamp/date/duration columns select in int64 tick space and
    # cast back at the end, so the result keeps the input type
    temporal = pa.types.is_temporal(col_type)
    val_type = pa.float64() if floating else \
        (col_type if temporal else pa.int64())

    hist = _hist_pass(ds, col, 48, None, n_parts)
    total = sum(hist.values())
    if total == 0:
        return pa.table({"q": pa.array(qs, pa.float64()),
                         "value": pa.nulls(len(qs), val_type)})
    # rank and current bucket per target, refined level by level
    targets = [{"q": q, "rank": int(np.ceil(q * total))} for q in qs]
    shift = 48
    while True:
        buckets = np.array(sorted(hist), dtype=np.uint64)
        counts = np.array([hist[int(b)] for b in buckets], dtype=np.int64)
        if shift == 48:
            cum = np.cumsum(counts)
            for tg in targets:
                i = int(np.searchsorted(cum, tg["rank"]))
                tg["bucket"] = int(buckets[i])
                tg["rank"] -= int(cum[i - 1]) if i else 0
        else:
            parents = buckets >> np.uint64(16)
            for tg in targets:
                sel = np.flatnonzero(parents == np.uint64(tg["bucket"]))
                cum = np.cumsum(counts[sel])
                i = int(np.searchsorted(cum, tg["rank"]))
                tg["bucket"] = int(buckets[sel[i]])
                tg["rank"] -= int(cum[i - 1]) if i else 0
        need = sorted({tg["bucket"] for tg in targets})
        pending = sum(hist[b] for b in need)
        if shift == 0 or pending <= collect_cap:
            break
        shift -= 16
        hist = _hist_pass(ds, col, shift,
                          np.array(need, dtype=np.uint64), n_parts)

    if shift == 0 and pending > collect_cap:
        # each candidate bucket is ONE exact key — no collection needed
        values = [_from_key(tg["bucket"], floating) for tg in targets]
    else:
        need_arr = np.array(need, dtype=np.uint64)

        def keep(t: pa.Table) -> pa.Table:
            k = _column_keys(t, col)
            b = k >> np.uint64(shift)
            pos = np.minimum(np.searchsorted(need_arr, b),
                             len(need_arr) - 1)
            k = k[need_arr[pos] == b]
            return pa.table({"k": pa.array(k, pa.uint64())})

        parts = [t["k"].to_numpy(zero_copy_only=False)
                 for t in ds.map_batches(keep, batch_format="pyarrow",
                                         batch_size=None)
                 .iter_batches(batch_format="pyarrow",
                               batch_size=1 << 20)]
        keys = np.sort(np.concatenate(parts) if parts
                       else np.zeros(0, np.uint64))
        kb = keys >> np.uint64(shift)
        values = []
        for tg in targets:
            seg = keys[kb == np.uint64(tg["bucket"])]
            values.append(_from_key(int(seg[tg["rank"] - 1]), floating))

    return pa.table({"q": pa.array([tg["q"] for tg in targets],
                                   pa.float64()),
                     "value": pa.array(values, val_type)})


def _grouped_quantile_partition(g: pa.Table, keys: list[str], col: str,
                                qs: list[float],
                                interpolation: str = "rank") -> pa.Table:
    """One lexsort + segment arithmetic: for every (composite) key in
    the partition and every q, the rank-ceil(q*n_valid) element (or
    linear interpolation) of the key's non-null values (null when the
    key has only nulls)."""
    from dedupe_api_ray.stages.asof import _sort_key_ints
    n = g.num_rows
    kcs = [_sort_key_ints(g[k]) for k in keys]
    valid = pc.is_valid(g[col]).to_numpy(zero_copy_only=False)
    vals = g[col].to_numpy(zero_copy_only=False)
    # same contract as exact_quantiles: a true NaN VALUE (valid, not
    # null — nulls also surface as NaN in the numpy view) would
    # factorize as the SMALLEST code and silently shift every rank
    if np.issubdtype(vals.dtype, np.floating) and valid.any() \
            and np.isnan(vals[valid]).any():
        raise ValueError(
            "grouped_quantiles: NaN values present — filter them "
            "upstream (NaN has no portable sort position)")
    # order: key, then valid rows by value with nulls LAST.  Numeric /
    # temporal dtypes sort natively (numpy's stable argsort already
    # places NaN and NaT last, and valid NaN raised above, so every
    # trailing NaN IS a null) — no factorize pass; only object dtypes
    # (strings) still pay a dense-rank factorize with +inf for nulls.
    from dedupe_api_ray.stages.asof import _composite_heads
    if np.issubdtype(vals.dtype, np.floating) \
            or np.issubdtype(vals.dtype, np.integer) \
            or np.issubdtype(vals.dtype, np.datetime64) \
            or np.issubdtype(vals.dtype, np.timedelta64):
        order = np.lexsort((vals, *reversed(kcs)))
    else:
        vc = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
        if valid.any():
            vv = vals[valid]
            import pandas as pd
            codes, _ = pd.factorize(vv, sort=True)
            vc[valid] = codes
        order = np.lexsort((vc, *reversed(kcs)))
    va = valid[order]
    heads = _composite_heads(kcs, order, n)
    starts = np.flatnonzero(heads)
    seg_len = np.diff(np.r_[starts, n])
    n_valid = np.add.reduceat(va.astype(np.int64), starts) if n \
        else np.zeros(0, np.int64)
    if interpolation == "linear":
        from dedupe_api_ray.utils import round_half_away
        if not np.issubdtype(vals.dtype, np.number):
            raise TypeError("grouped_quantiles: interpolation='linear' "
                            f"needs a numeric column, got {vals.dtype}")
        vf = np.zeros(n, dtype=np.float64)
        if n:
            vf = vals[order].astype(np.float64)  # nulls→NaN, never read
        out_key, out_q, out_val, out_ok = [], [], [], []
        for q in qs:
            # SQL quantile_cont replay: h = q*(n-1); value =
            # v[lo] + (h - lo) * (v[hi] - v[lo]), hi clamped at the
            # segment end — IDENTICAL expression order to the oracle
            h = q * (n_valid - 1).astype(np.float64)
            lo = np.floor(h).astype(np.int64)
            hi = np.minimum(lo + 1, np.maximum(n_valid - 1, 0))
            okq = n_valid > 0
            ilo = starts + np.where(okq, lo, 0)
            ihi = starts + np.where(okq, hi, 0)
            v = vf[ilo] + (h - lo) * (vf[ihi] - vf[ilo])
            out_key.append(starts)
            out_q.append(np.full(len(starts), q))
            out_val.append(round_half_away(v, 6))
            out_ok.append(okq)
        ok = np.concatenate(out_ok) if out_ok else np.zeros(0, bool)
        vals_all = np.concatenate(out_val) if out_val else \
            np.zeros(0, np.float64)
        val_out = pc.if_else(
            pa.array(ok),
            pa.array(np.where(ok, vals_all, 0.0), pa.float64()),
            pa.scalar(None, pa.float64()))
    else:
        out_key, out_q, out_idx = [], [], []
        for q in qs:
            ranks = np.ceil(q * n_valid).astype(np.int64)
            idx = starts + np.maximum(ranks, 1) - 1  # clamped; masked
            out_key.append(starts)
            out_q.append(np.full(len(starts), q))
            out_idx.append(np.where(n_valid > 0, idx, -1))
        idx_all = np.concatenate(out_idx) if out_idx else \
            np.zeros(0, np.int64)
        ok = idx_all >= 0
        val_take = g[col].take(pa.array(order[np.where(ok, idx_all, 0)],
                                        pa.int64()))
        val_out = pc.if_else(pa.array(ok), val_take,
                             pa.scalar(None, type=val_take.type))
    key_take = pa.array(order[np.concatenate(out_key)] if out_key
                        else [], pa.int64())
    return pa.table({
        **{k: g[k].take(key_take) for k in keys},
        "q": pa.array(np.concatenate(out_q) if out_q else [],
                      pa.float64()),
        "value": val_out})


def grouped_quantiles(ds: ray.data.Dataset, *, key: str | list[str],
                      col: str, qs: list[float],
                      interpolation: str = "rank",
                      num_partitions: int | None = None
                      ) -> ray.data.Dataset:
    """Per-key (one column or a composite list) exact quantiles over
    the key's non-null ``col`` values
    (one output row per key per q; null value when the key has only
    nulls).  ``interpolation="rank"`` (default): the rank-``ceil(q*n)``
    order statistic, exact in the input type.
    ``interpolation="linear"``: SQL ``quantile_cont`` semantics —
    ``h = q*(n-1)``, ``v[lo] + (h-lo)*(v[hi]-v[lo])`` — numeric
    columns only, float64 result rounded half-away at 6 dp (the exact
    expression a SQL oracle replays).  ONE hash shuffle by key, one
    lexsort kernel per partition — the grouped complement of
    ``exact_quantiles``.  Partitioning assumption: one key's rows fit
    in one partition (the same assumption as the join/window
    family)."""
    from dedupe_api_ray.utils import shuffle_partitions
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("grouped_quantiles: each q must be in (0, 1]")
    if interpolation not in ("rank", "linear"):
        raise ValueError(
            f"grouped_quantiles: unknown interpolation {interpolation!r}")
    keys = [key] if isinstance(key, str) else list(key)
    if not keys:
        raise ValueError("grouped_quantiles: key list is empty")
    if interpolation == "linear":
        # fail driver-side, not inside a shuffled Ray task
        from dedupe_api_ray.stages.asof import _arrow_schema
        ct = _arrow_schema(ds).field(col).type
        if not (pa.types.is_integer(ct) or pa.types.is_floating(ct)):
            raise TypeError("grouped_quantiles: interpolation='linear' "
                            f"needs a numeric column, got {ct}")
    n_parts = shuffle_partitions(num_partitions)

    def tag(t: pa.Table) -> pa.Table:
        from dedupe_api_ray.stages.asof import _tag_partition_keys
        return _tag_partition_keys(t.select([*keys, col]), keys, n_parts)

    def kernel(g: pa.Table) -> pa.Table:
        return _grouped_quantile_partition(g, keys, col, list(qs),
                                           interpolation)

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__part", num_partitions=n_parts) \
        .map_groups(kernel, batch_format="pyarrow")
