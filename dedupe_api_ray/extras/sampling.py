"""Deterministic sampling operators for training-data pipelines.

Random sampling in a distributed engine should not be random at run
time: a sample that changes between runs (or with parallelism) makes
every downstream artifact unreproducible.  Both operators here derive
per-row ranks from a splitmix64 avalanche of the row's id — pure
functions of (id, seed), so results are byte-stable across runs,
block layouts and cluster sizes, and the exact same sample is
expressible in SQL (the DuckDB oracles replay the avalanche with
HUGEINT modular arithmetic, 32-bit-split multiplies to stay inside
INT128).

- ``bernoulli_sample``: keep a row iff hash(id, seed) < fraction·2^64.
  A pure ``map_batches`` filter — no shuffle, no state, scales
  perfectly; the expected (not exact) fraction is the standard
  trade for a single-pass sample.
- ``stratified_sample``: the exact n lowest-hash rows per group
  (per-language / per-source quotas).  Each input batch first prunes
  to its own per-group top-n (a combiner: the global top-n per group
  is a subset of the union of per-batch top-ns), so the groupby
  shuffle moves at most n rows per (group, block) instead of the
  whole table; one vectorized kernel per group then takes the exact
  top-n.  Hash ties are impossible to matter: rank order is
  (hash, id) and ids are unique.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from dedupe_api_ray.extras.ngram_dup import _avalanche

_GOLD = 0x9E3779B97F4A7C15
_HASH_COL = "__sample_h"


def sample_hash(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """uint64 rank per id: splitmix64(id + (seed+1)·golden)."""
    ids = np.asarray(ids).astype(np.uint64, copy=False)
    off = np.uint64(((seed + 1) * _GOLD) % (1 << 64))
    with np.errstate(over="ignore"):
        return _avalanche(ids + off)


def fraction_threshold(fraction: float) -> int:
    """The uint64 cutoff for a Bernoulli fraction; exposed so SQL
    oracles embed the IDENTICAL constant."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return min(int(fraction * (1 << 64)), (1 << 64) - 1)


def bernoulli_sample(ds: ray.data.Dataset, *, id_col: str,
                     fraction: float, seed: int = 0) -> ray.data.Dataset:
    """Keep each row independently iff its id-hash falls under the
    fraction cutoff — deterministic, shuffle-free, ~fraction of rows."""
    if fraction >= 1.0:
        fraction_threshold(fraction)  # still validates the range
        return ds  # identity: the clamped cutoff would drop a row
        # whose hash is exactly 2^64-1
    thr = np.uint64(fraction_threshold(fraction))

    def keep(t: pa.Table) -> pa.Table:
        h = sample_hash(t[id_col].to_numpy(zero_copy_only=False), seed)
        return t.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def _group_codes(t: pa.Table, key_cols: list[str]) -> np.ndarray:
    """Within-batch integer code per distinct key tuple (labels only —
    never compared across batches)."""
    codes: np.ndarray | None = None
    for c in key_cols:
        ci, uniq = pd.factorize(t[c].to_numpy(zero_copy_only=False))
        ci = ci.astype(np.int64, copy=False)
        codes = ci if codes is None else codes * np.int64(len(uniq) + 1) + ci
    assert codes is not None
    return codes


def _topn_per_group(t: pa.Table, codes: np.ndarray, h: np.ndarray,
                    ids: np.ndarray, n: int) -> pa.Table:
    """Rows with the n smallest (h, id) per group code — one lexsort,
    no per-group Python."""
    order = np.lexsort((ids, h, codes))
    k = codes[order]
    new = np.r_[True, k[1:] != k[:-1]]
    seg_start = np.flatnonzero(new)
    seg_len = np.diff(np.r_[seg_start, len(k)])
    rank = np.arange(len(k)) - np.repeat(seg_start, seg_len)
    keep = order[rank < n]
    return t.take(pa.array(np.sort(keep), pa.int64()))


def stratified_sample(ds: ray.data.Dataset, *, key_cols: list[str],
                      id_col: str, n: int, seed: int = 0,
                      num_partitions: int | None = None
                      ) -> ray.data.Dataset:
    """Exact deterministic quota sample: the n lowest-hash rows per
    distinct ``key_cols`` tuple (all rows if the group is smaller)."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    from dedupe_api_ray.utils import shuffle_partitions
    n_parts = shuffle_partitions(num_partitions)

    def prune(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h = sample_hash(ids, seed)
        # sign-bit flip maps uint64 order onto int64 order, so the
        # carried column sorts identically to the uint64 ranks
        signed = (h ^ np.uint64(1 << 63)).view(np.int64)
        t = t.append_column(_HASH_COL, pa.array(signed, pa.int64()))
        codes = _group_codes(t, key_cols)
        ids64 = np.asarray(ids).astype(np.int64, copy=False)
        return _topn_per_group(t, codes, h, ids64, n)

    pruned = ds.map_batches(prune, batch_format="pyarrow")

    def finish(g: pa.Table) -> pa.Table:
        h = g[_HASH_COL].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64,
                                                              copy=False)
        codes = _group_codes(g, key_cols)
        out = _topn_per_group(g, codes, h, ids, n)
        return out.drop_columns([_HASH_COL])

    return pruned.groupby(key_cols, num_partitions=n_parts) \
        .map_groups(finish, batch_format="pyarrow")
