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


def _bloom_hashes(keys: np.ndarray, m_bits: int, k: int
                  ) -> list[np.ndarray]:
    """k bit indices per key via double hashing: h1 from the same
    ``pandas.util.hash_array`` the partition tag uses, h2 a splitmix
    avalanche of h1 (independent enough for Bloom FP bounds)."""
    h1 = pd.util.hash_array(np.asarray(keys), categorize=False)
    with np.errstate(over="ignore"):
        z = (h1 ^ (h1 >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h2 = (z ^ (z >> np.uint64(31))) | np.uint64(1)  # odd → full cycle
        return [((h1 + np.uint64(i) * h2) % np.uint64(m_bits))
                for i in range(k)]


def _bloom_add(bits: np.ndarray, keys: np.ndarray, m_bits: int,
               k: int) -> None:
    for idx in _bloom_hashes(keys, m_bits, k):
        np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))


def _bloom_test(bits: np.ndarray, keys: np.ndarray, m_bits: int,
                k: int) -> np.ndarray:
    hit = np.ones(len(keys), dtype=bool)
    for idx in _bloom_hashes(keys, m_bits, k):
        byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
        hit &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1 != 0
    return hit


def _norm_keys(col: pa.ChunkedArray, target: pa.DataType) -> np.ndarray:
    """The SAME normalization _tag_partition hashes (one shared
    implementation — see asof._norm_key_array), so bloom and
    partition decisions agree bit-for-bit."""
    from dedupe_api_ray.stages.asof import _norm_key_array
    return _norm_key_array(col, target)


def _membership_partition(g: pa.Table, key: str, left_cols: list[str],
                          anti: bool) -> pa.Table:
    side = g["__side"].to_numpy(zero_copy_only=False)
    # normalize arrow-side BEFORE factorizing: a nullable int64 key's
    # to_numpy float64-promotes, collapsing distinct keys >= 2^53 onto
    # one code (false membership); _norm_key_array keeps int64 exact
    # (nulls -> 0 there, masked back to -1 here via validity)
    from dedupe_api_ray.stages.asof import _norm_key_array
    kv = _norm_key_array(g[key], g[key].type)
    codes, _ = pd.factorize(kv, sort=False)
    valid = pc.is_valid(g[key]).to_numpy(zero_copy_only=False)
    codes = np.where(valid, codes, -1)  # nulls → -1
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
                 num_partitions: int | None,
                 prefilter: str | None = None,
                 bloom_bits: int = 1 << 23) -> ray.data.Dataset:
    from dedupe_api_ray.utils import shuffle_partitions
    n_parts = shuffle_partitions(num_partitions)
    right_on = right_on or left_on
    left_schema = _arrow_schema(left)
    left_cols = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_schema = _arrow_schema(right)
    if right_on not in right_schema.names:
        raise ValueError(f"right side lacks column {right_on!r}")
    if prefilter not in (None, "bloom"):
        raise ValueError(f"unknown prefilter {prefilter!r}")

    misses = None  # anti-join rows settled by the bloom, shuffle-free
    if prefilter == "bloom":
        k_hashes = 4
        key_t = left_types[left_on]

        def partial_bloom(t: pa.Table) -> pa.Table:
            b = np.zeros(bloom_bits >> 3, dtype=np.uint8)
            keys = _norm_keys(pc.drop_null(t[right_on]), key_t)
            if len(keys):
                _bloom_add(b, keys, bloom_bits, k_hashes)
            return pa.table({"b": pa.array([b.tobytes()], pa.binary())})

        bits = np.zeros(bloom_bits >> 3, dtype=np.uint8)
        for bt in right.map_batches(
                partial_bloom, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=64):
            for buf in bt["b"].to_pylist():
                bits |= np.frombuffer(buf, dtype=np.uint8)
        bloom_ref = ray.put(bits)

        def split(t: pa.Table, want_hits: bool) -> pa.Table:
            t = t.select(left_cols)
            b = ray.get(bloom_ref)
            hit = _bloom_test(b, _norm_keys(t[left_on], key_t),
                              bloom_bits, k_hashes)
            return t.filter(pa.array(hit if want_hits else ~hit))

        if anti:
            # bloom MISSES are definitely-absent: emit them directly,
            # only possible hits pay the shuffle
            misses = left.map_batches(lambda t: split(t, False),
                                      batch_format="pyarrow")
        left = left.map_batches(lambda t: split(t, True),
                                batch_format="pyarrow")

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

    out = unioned.groupby("__part", num_partitions=n_parts) \
        .map_groups(kernel, batch_format="pyarrow")
    return out.union(misses) if misses is not None else out


def semi_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
              left_on: str, right_on: str | None = None,
              num_partitions: int | None = None,
              prefilter: str | None = None,
              bloom_bits: int = 1 << 23) -> ray.data.Dataset:
    """Left rows whose key EXISTS on the right (left columns only).

    ``prefilter="bloom"`` builds a Bloom filter over the right keys
    (one extra streaming pass over the right; ``bloom_bits`` sized for
    ~1% FP at ~1M distinct keys by default) and drops definite-miss
    left rows BEFORE the shuffle — at low hit rates almost nothing
    moves.  False positives are resolved by the exact kernel, so the
    result is identical either way (equivalence-tested)."""
    return _exists_join(left, right, left_on, right_on, False,
                        num_partitions, prefilter, bloom_bits)


def anti_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
              left_on: str, right_on: str | None = None,
              num_partitions: int | None = None,
              prefilter: str | None = None,
              bloom_bits: int = 1 << 23) -> ray.data.Dataset:
    """Left rows whose key does NOT exist on the right (left columns
    only; null-key left rows are kept, per SQL NOT EXISTS).

    ``prefilter="bloom"``: definite-miss rows (the anti join's likely
    bulk) bypass the shuffle entirely and are emitted directly; only
    possible hits pay the exact membership pass."""
    return _exists_join(left, right, left_on, right_on, True,
                        num_partitions, prefilter, bloom_bits)
