"""Blocking stages: record prep, fingerprinting (block-key emission),
hot-key salting and candidate-pair generation.

Reference flow (†, SURVEY.md §2.3/§2.5): dedupe:dedupe/blocking.py::
Fingerprinter emits (block_key, record_id) for the learned predicate
union; dedupe:dedupe/api.py::Dedupe.pairs runs the SQL-style
``SELECT DISTINCT ordered pairs FROM blocking_map self-join``.

Ray-Data shapes:
- prep + fingerprint = stateless/actor ``map_batches`` (predicate
  evaluation is per-record Python by nature — same as the reference —
  but tokens are hoisted and the model is broadcast via ``ray.put``);
- pair generation = ``groupby(block_key).map_groups`` (first shuffle)
  followed by a pair-distinct groupby (second shuffle);
- hot keys: counts above ``max_block_size`` are split into sub-blocks
  by ``record_id % k`` and every cross-sub-block (i, j) group is
  enumerated so no pair is lost ("skew-salted hot-block splitting",
  BASELINE.json north_star); keys above ``hard_cap`` are dropped like
  a stopword (explicit at web scale; the reference only avoids this
  implicitly through block learning †, SURVEY.md §4).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from dedupe_api_ray.functions.text import normalize_array, tokenize_array
from dedupe_api_ray.model import Model, _record_keys


def prepare_records(ds: ray.data.Dataset, field_defs, id_col: str = "record_id",
                    tokenize: bool = True) -> ray.data.Dataset:
    """M1: vectorized preProcess of every string field + hoisted
    tokens columns (``<field>__tokens``) for Text/Set-over-text use.

    ``tokenize=False`` defers token columns (use ``add_tokens`` after
    any hash join — Arrow's hash join rejects list<> payload columns,
    so list columns must be added after, or re-derived inside, joined
    stages)."""
    string_fields = [f.field for f in field_defs
                     if f.type in ("String", "ShortString", "Text")]
    token_fields = [f.field for f in field_defs if f.type == "Text"]

    def prep(batch: pa.Table) -> pa.Table:
        cols = {name: batch[name] for name in batch.column_names}
        for name in string_fields:
            cols[name] = normalize_array(cols[name])
        if tokenize:
            for name in token_fields:
                cols[f"{name}__tokens"] = tokenize_array(cols[name])
        return pa.table(cols)

    return ds.map_batches(prep, batch_format="pyarrow")


def add_tokens(ds: ray.data.Dataset, field_defs) -> ray.data.Dataset:
    """Hoisted tokens columns for Text fields (post-join stage)."""
    token_fields = [f.field for f in field_defs if f.type == "Text"]
    if not token_fields:
        return ds

    def fn(batch: pa.Table) -> pa.Table:
        cols = {name: batch[name] for name in batch.column_names}
        for name in token_fields:
            cols[f"{name}__tokens"] = tokenize_array(cols[name])
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


class Fingerprinter:
    """Actor-pool map_batches callable emitting the blocking map.

    State (the model's predicate union) is fetched once per actor from
    the object store; per batch it evaluates the union and explodes to
    (block_key, record_id) rows, keys tagged ``{pred_index}:{key}``
    (reference '{}:{}' tagging †).

    Specs whose predicates have Arrow/numpy emitters run VECTORIZED
    over the whole batch (``blocking.vectorized``, byte-identical to
    the scalar ``model._record_keys`` — asserted in tests); the rest
    (suffixArray, metaphone, set/price/latlong, n-gram fingerprints)
    fall back to the reference-style per-record loop, restricted to
    exactly those specs."""

    def __init__(self, model_ref):
        from dedupe_api_ray.blocking.vectorized import can_vectorize
        self.model: Model = ray.get(model_ref) if isinstance(
            model_ref, ray.ObjectRef) else model_ref
        specs = [(i, s) for i, s in enumerate(self.model.predicates)
                 if s.kind in ("simple", "compound")]
        self.vec_specs = [(i, s) for i, s in specs if can_vectorize(s)]
        self.scalar_specs = [(i, s) for i, s in specs
                             if not can_vectorize(s)]
        self.fields = sorted({f.field for f in self.model.field_defs
                              if f.type != "Interaction"})

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dedupe_api_ray.blocking.vectorized import emit_spec
        rids = batch["record_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        parts: list[pa.Table] = []
        token_cache: dict = {}
        for idx, spec in self.vec_specs:
            keys, rows = emit_spec(spec, batch, token_cache)
            if len(rows):
                tagged = pa.compute.binary_join_element_wise(
                    pa.scalar(f"{idx}:"), keys, pa.scalar(""))
                parts.append(pa.table({
                    "block_key": tagged,
                    "record_id": pa.array(rids[rows], pa.int64())}))
        if self.scalar_specs:
            n = len(batch)
            cols = {}
            names = set(batch.column_names)
            for f in self.fields:
                if f in names:
                    cols[f] = batch[f].to_pylist()
                tk = f"{f}__tokens"
                if tk in names:
                    cols[tk] = batch[tk].to_pylist()
            out_keys: list[str] = []
            out_ids: list[int] = []
            for r in range(n):
                rec = {k: v[r] for k, v in cols.items()}
                for idx, spec in self.scalar_specs:
                    for k in _record_keys(spec, rec):
                        out_keys.append(f"{idx}:{k}")
                        out_ids.append(rids[r])
            if out_keys:
                parts.append(pa.table({
                    "block_key": pa.array(out_keys, pa.string()),
                    "record_id": pa.array(out_ids, pa.int64())}))
        if not parts:
            return pa.table({"block_key": pa.array([], pa.string()),
                             "record_id": pa.array([], pa.int64())})
        return pa.concat_tables(parts).combine_chunks()


def fingerprint_records(records: ray.data.Dataset, model: Model,
                        concurrency: int | tuple | None = None
                        ) -> ray.data.Dataset:
    from dedupe_api_ray.utils import actor_pool
    if concurrency is None:
        concurrency = actor_pool()
    model_ref = ray.put(model)
    return records.map_batches(
        Fingerprinter, fn_constructor_kwargs={"model_ref": model_ref},
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1)


# ---------------------------------------------------------------------------
# Candidate pairs with skew-salted hot blocks (J1/J2 + §4.2)
# ---------------------------------------------------------------------------


_PAIR_CHUNK = 20_000_000  # max pairs materialized per vectorized gather
# max blocking-map rows for the driver-side hot-key count finish;
# module-level so tests can force the shuffle-groupby scale path
COUNT_DRIVER_MAX = 20_000_000
# distinct="auto" crossover: below this expected emitted-pair volume
# the global distinct sort is cheap and removes cross-predicate
# duplicate SCORING work; above it the all-to-all dominates.  Measured
# hash-identical A/Bs on the bench corpus: 44M pairs @ 474k pages,
# 8 CPUs — exact 276s vs local 370s (exact wins); 135M pairs @ 950k
# pages, 32 CPUs — local 438s vs exact 744s (local wins 1.7x).
LOCAL_DISTINCT_MIN_PAIRS = 80_000_000


def _emit_pairs_partition(g: pd.DataFrame) -> pd.DataFrame:
    """One hash PARTITION of block keys (many keys per call) → ordered
    candidate pairs, fully vectorized.

    ``salt_code`` (optional int column): sub-block id for salted hot
    keys (0 = unsalted).  A salted group is (block_key, salt_code) —
    the key column itself stays its ORIGINAL dtype (string predicates
    or int64 LSH band keys alike), instead of the r3 scheme of
    formatting 'key#i.j' strings per hot row.

    Replaces the r2 per-block-key ``map_groups`` (one pandas call per
    key — ~50 µs × hundreds of thousands of keys dominated the pairs
    stage): keys in the partition are factorized, rows lexsorted by
    (key, side, id), segment boundaries found once, and pair
    enumeration batched BY SEGMENT SHAPE — all triangle segments of
    length k emitted with one ``np.triu_indices(k)`` gather over an
    (m, k) matrix, all bipartite (salted cross-sub) segments of shape
    (l, r) with one broadcast product.  Python-level work is
    O(#distinct segment shapes), not O(#keys).

    ``side``: 0 = triangle member (unsalted key, or the i-rows of a
    salted '(i, i)' group); for a salted cross group '(i, j)', i < j,
    rows carry side -1 (record's salt == i) or +1 (== j) and only
    left×right pairs are emitted — within-sub pairs come from the
    (i, i) / (j, j) groups, keeping salting lossless.  A cross segment
    that received rows from only ONE side (skewed salted block) emits
    nothing — it is NOT a triangle, and emitting its within-sub pairs
    would duplicate the diagonal groups' output."""
    empty = pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                          "id_b": pd.Series(dtype=np.int64)})
    if len(g) == 0:
        return empty
    codes, _ = pd.factorize(g["block_key"].to_numpy(), sort=False)
    if "salt_code" in g.columns:
        sc = g["salt_code"].to_numpy().astype(np.int64, copy=False)
        codes = codes.astype(np.int64) * (int(sc.max()) + 1) + sc
    ids = g["record_id"].to_numpy().astype(np.int64, copy=False)
    side = (g["side"].to_numpy().astype(np.int8, copy=False)
            if "side" in g.columns else np.zeros(len(g), np.int8))
    order = np.lexsort((ids, side, codes))
    c, s, i = codes[order], side[order], ids[order]
    # drop duplicate (key, side, id) rows so segments hold unique ids
    keep = np.ones(len(c), dtype=bool)
    keep[1:] = (c[1:] != c[:-1]) | (s[1:] != s[:-1]) | (i[1:] != i[:-1])
    c, s, i = c[keep], s[keep], i[keep]
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    seg_len = np.diff(np.r_[starts, len(c)])
    n_right = np.add.reduceat((s == 1).astype(np.int64), starts)
    n_left = np.add.reduceat((s == -1).astype(np.int64), starts)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []

    # triangle segments, grouped by length (ids ascend within a
    # segment, so triu output is already ordered id_a < id_b).  A
    # one-sided salted cross segment (n_left or n_right zero but not
    # both) matches NEITHER branch and emits nothing, by design.
    tri = np.flatnonzero((n_right == 0) & (n_left == 0) & (seg_len >= 2))
    for k in np.unique(seg_len[tri]):
        sel = starts[tri[seg_len[tri] == k]]
        ia, ib = np.triu_indices(k, k=1)
        step = max(1, _PAIR_CHUNK // max(1, len(ia)))
        for lo_ in range(0, len(sel), step):
            mat = i[sel[lo_:lo_ + step, None] + np.arange(k)[None, :]]
            out_a.append(mat[:, ia].ravel())
            out_b.append(mat[:, ib].ravel())

    # bipartite (salted-cross) segments, grouped by (l, r) shape
    cross = np.flatnonzero((n_right > 0) & (n_left > 0))
    if len(cross):
        shape_key = n_left[cross] * (seg_len.max() + 1) + n_right[cross]
        for sk in np.unique(shape_key):
            sel_i = cross[shape_key == sk]
            l, r = int(n_left[sel_i[0]]), int(n_right[sel_i[0]])
            sel = starts[sel_i]
            step = max(1, _PAIR_CHUNK // max(1, l * r))
            for lo_ in range(0, len(sel), step):
                ss = sel[lo_:lo_ + step]
                lm = i[ss[:, None] + np.arange(l)[None, :]]
                rm = i[ss[:, None] + l + np.arange(r)[None, :]]
                aa = np.broadcast_to(lm[:, :, None],
                                     (len(ss), l, r)).reshape(-1)
                bb = np.broadcast_to(rm[:, None, :],
                                     (len(ss), l, r)).reshape(-1)
                out_a.append(np.minimum(aa, bb))
                out_b.append(np.maximum(aa, bb))
    if not out_a:
        return empty
    return pd.DataFrame({"id_a": np.concatenate(out_a),
                         "id_b": np.concatenate(out_b)})


def distinct_pairs(pairs: ray.data.Dataset, col_a: str = "id_a",
                   col_b: str = "id_b",
                   num_buckets: int | None = None) -> ray.data.Dataset:
    """Global distinct over a two-int64-key table WITHOUT a multi-key
    groupby (Ray 2.49's multi-column groupby degrades badly past ~1M
    rows).  Shape: per-batch local dedup (cuts shuffle volume) → hash
    bucket on (a, b) → single-int-key groupby → vectorized
    drop_duplicates per bucket.

    ``num_buckets`` defaults to 8× the shuffle partition count: each
    bucket becomes ONE output block, and downstream operators (the
    scorer pool above all) inherit that granularity — a fixed 64
    buckets left 32 CPUs consuming 64 skewed blocks, so one 630k-pair
    block strangled the whole scoring stage."""
    from dedupe_api_ray.utils import shuffle_partitions
    if num_buckets is None:
        num_buckets = shuffle_partitions() * 8
    def bucket(t: pa.Table) -> pa.Table:
        a = t[col_a].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t[col_b].to_numpy(zero_copy_only=False).astype(np.uint64)
        df = pd.DataFrame({col_a: a.astype(np.int64),
                           col_b: b.astype(np.int64)})
        df = df.drop_duplicates()  # local pre-dedup
        h = ((df[col_a].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
             ^ df[col_b].to_numpy().astype(np.uint64)) % np.uint64(num_buckets)
        df["__bucket"] = h.astype(np.int64)
        # strip the b'pandas' schema metadata: pyarrow schemas carrying
        # it are UNHASHABLE (metadata dict), and Ray's reduce-side
        # schema unification then warns "Failed to hash the schemas"
        # on every reduce task — burying real signal in bench logs
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates([col_a, col_b])[[col_a, col_b]]

    from dedupe_api_ray.utils import shuffle_partitions
    return pairs.map_batches(bucket, batch_format="pyarrow") \
        .groupby("__bucket",
                 num_partitions=min(num_buckets, shuffle_partitions())) \
        .map_groups(dedup, batch_format="pandas")


def candidate_pairs(blocking_map: ray.data.Dataset,
                    max_block_size: int = 500,
                    hard_cap: int = 20_000,
                    metrics: dict | None = None,
                    hard_cap_mode: str = "sample",
                    max_sampled_pairs: int = 200_000,
                    distinct: str = "exact") -> ray.data.Dataset:
    """blocking_map (block_key, record_id) → distinct ordered pairs.

    1. per-key counts (small aggregate); keys with count > max_block_
       size are salted into ceil(n/max_block_size) sub-blocks with
       full (i, j) cross-group enumeration; keys with count >
       hard_cap (stopword blocks — e.g. firstTokenPredicate on 'the'
       over web text) are handled per ``hard_cap_mode``:
       - "sample" (default): keep a DETERMINISTIC uniform member
         subset (keep iff a splitmix-style hash of (block_key,
         record_id) falls under target/count — a pure per-row
         function, so output is identical across parallelism and
         runs) and salt the survivors.  Records in the block keep
         stochastic pair coverage instead of losing the predicate
         entirely (the r3 VERDICT recall hole: 13 dropped keys =
         289,548 member-rows at 237k pages).  The member target is
         min(hard_cap, ~sqrt(2·max_sampled_pairs)): a stopword
         block's surviving PAIR volume is capped at
         ~``max_sampled_pairs``, because a member cap alone is
         quadratic in pairs — sampling to hard_cap=2000 members
         still emitted ~2M pairs PER KEY into the scorer (~38M junk
         pairs at 474k pages, half the scoring stage) for a
         within-key recall that is ≈0 either way ((m/c)² with
         c ≫ m; true dups in stopword blocks are recovered by their
         other, selective predicates).
       - "drop": the r3 behavior — the key is dropped like a
         stopword (WARNING-logged, metric'd, never silent).
    2. groupby(block_key[,salt]) emits ordered pairs per group;
    3. distinct over (id_a, id_b) — cross-block duplicate removal
       (the reference's SQL DISTINCT †).  ``distinct`` picks how:
       - "exact" (default): global distinct via the bucketed
         sort-shuffle (``distinct_pairs``) — the contract for any
         caller that RETURNS the pair set (queries, record link).
       - "auto": "local" iff the expected emitted volume exceeds
         ``LOCAL_DISTINCT_MIN_PAIRS`` (the measured crossover where
         the all-to-all sort costs more than re-scoring ~tens of
         percent cross-predicate duplicates), else "exact".
         Deterministic: the choice is a pure function of key counts.
       - "local": per-block dedup only.  Skips the second all-to-all
         sort barrier entirely; cross-partition duplicates (~8% of
         emitted pairs on the web bench at 950k pages) survive into
         the scorer, whose per-pair score is a pure function of the
         two records, and are removed EXACTLY (and cheaply) inside
         the clustering partition kernel where edges are already
         co-located by component.  This is the entity-map scale
         path: at 950k pages the 135M-pair distinct sort cost more
         wall than scoring the 8% duplicate pairs it removes, AND it
         barriered the scorer pool behind the full pair shuffle.

    ``metrics`` (optional dict) receives: dropped_keys, dropped_rows,
    salted_keys, sampled_keys, sampled_rows_total and
    est_pair_recall (expected surviving fraction of the affected
    keys' within-block pairs ≈ (hard_cap/count)^2; 1.0 if no key was
    capped).
    """
    if hard_cap_mode not in ("sample", "drop"):
        raise ValueError(f"unknown hard_cap_mode: {hard_cap_mode!r}")
    if distinct not in ("exact", "local", "auto"):
        raise ValueError(f"unknown distinct mode: {distinct!r}")
    import logging

    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    # the blocking map is consumed twice (key counts, then salting):
    # pin it so the upstream fingerprint stage doesn't execute twice
    blocking_map = blocking_map.materialize()

    # per-key counts with a per-batch PARTIAL aggregate first: the
    # count shuffle then moves (key, cnt) partials, not every
    # (key, record_id) row — the combiner-before-shuffle rule
    def local_counts(t: pa.Table) -> pa.Table:
        g = t.group_by("block_key").aggregate([("record_id", "count")])
        return pa.table({"block_key": g["block_key"],
                         "cnt": g["record_id_count"]})

    partials = blocking_map.map_batches(local_counts,
                                        batch_format="pyarrow")
    if blocking_map.count() <= COUNT_DRIVER_MAX:
        # modest blocking map: finish the count on the driver — the
        # partials are ≤ one narrow row per (key, batch), and a
        # shuffle groupby pays an aggregator-pool startup that dwarfs
        # summing a few MB of partials in Arrow
        pbatches = list(partials.iter_batches(batch_format="pyarrow",
                                              batch_size=1 << 20))
        ptbl = (pa.concat_tables(pbatches) if pbatches else
                pa.table({"block_key": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())}))
        g = ptbl.group_by("block_key").aggregate([("cnt", "sum")])
        mask = pc.greater(g["cnt_sum"], max_block_size)
        hot_tbl = g.filter(mask)
        hot_counts: dict[str, int] = dict(zip(
            hot_tbl["block_key"].to_pylist(),
            hot_tbl["cnt_sum"].to_pylist()))
        _c = g["cnt_sum"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        all_pairs = float((_c * (_c - 1) / 2).sum())
    else:
        counts = partials.groupby("block_key") \
            .aggregate(Sum("cnt", alias_name="cnt"))
        counts = counts.materialize()  # consumed twice below
        hot = counts.map_batches(
            lambda t: t.filter(pc.greater(t["cnt"], max_block_size)),
            batch_format="pyarrow").to_pandas()
        # .tolist(): plain Python ints, not np.int64 — these counts
        # flow into the metrics dict, which checkpoint manifests and
        # the job CLI json.dump (np.int64 is not JSON-serializable)
        hot_counts = ({} if hot.empty else
                      dict(zip(hot["block_key"].tolist(),
                               hot["cnt"].tolist())))
        all_pairs = counts.map_batches(
            lambda t: pa.table({"p": pa.array([float(
                ((c := t["cnt"].to_numpy(zero_copy_only=False)
                  .astype(np.float64)) * (c - 1) / 2).sum())])}),
            batch_format="pyarrow").sum("p") or 0.0
    capped = {k: c for k, c in hot_counts.items() if c > hard_cap}
    dropped = set(capped) if hard_cap_mode == "drop" else set()
    # member sample target: pair volume per capped key stays under
    # ~max_sampled_pairs (C(m, 2) <= budget), never above hard_cap
    m_tgt = min(hard_cap,
                int((1 + math.sqrt(1 + 8 * max_sampled_pairs)) / 2))
    # sampled keys: keep rate m_tgt/c, then salt the expected m_tgt
    # survivors like any hot key
    sampled = ({} if hard_cap_mode == "drop" else
               {k: m_tgt / c for k, c in capped.items()})
    k_smp = math.ceil(m_tgt / max_block_size)
    salt_k = {k: math.ceil(c / max_block_size)
              for k, c in hot_counts.items() if k not in capped}
    salt_k.update({k: k_smp for k in sampled})
    tot_pairs = sum(c * (c - 1) / 2 for c in capped.values())
    kept_pairs = (0.0 if hard_cap_mode == "drop" else
                  len(capped) * m_tgt * (m_tgt - 1) / 2)
    # 3 significant digits, not fixed decimals: under key skew the
    # true ratio can be ~1e-5 and a 4-dp round reports a misleading 0.0
    est_recall = (1.0 if not capped else
                  float(f"{min(1.0, kept_pairs / tot_pairs):.3g}"))
    expected_pairs = int(all_pairs - tot_pairs
                         + (0.0 if hard_cap_mode == "drop" else kept_pairs))
    if distinct == "auto":
        # deterministic (pure function of the key counts), so output
        # stays byte-identical across parallelism levels
        distinct = ("local" if expected_pairs > LOCAL_DISTINCT_MIN_PAIRS
                    else "exact")
        logging.getLogger("dedupe_api_ray.blocking").info(
            "candidate_pairs: distinct=auto -> %s (expected %d pairs, "
            "crossover %d)", distinct, expected_pairs,
            LOCAL_DISTINCT_MIN_PAIRS)
    if metrics is not None:
        # free post-materialize; callers size the scorer pool's floor
        # by blocking volume WITHOUT forcing a pairs materialization
        metrics["blocking_rows"] = blocking_map.count()
        metrics["dropped_keys"] = len(dropped)
        metrics["dropped_rows"] = int(sum(capped[k] for k in dropped))
        metrics["salted_keys"] = len(salt_k) - len(sampled)
        metrics["sampled_keys"] = len(sampled)
        metrics["sampled_rows_total"] = int(sum(capped[k] for k in sampled))
        metrics["sample_target_members"] = m_tgt if sampled else 0
        metrics["est_pair_recall"] = est_recall
        # expected EMITTED pair volume (pre-distinct; capped keys
        # counted at their sampled budget): pair cost is quadratic in
        # block size, so this is the number to check BEFORE paying for
        # scoring — a fixed-cardinality key (e.g. url_host) doubles it
        # 4x when the corpus doubles, and hard_cap is the knob that
        # bounds it (see BENCH/BASELINE.md round-4 950k-page finding)
        metrics["est_candidate_pairs"] = expected_pairs
        metrics["pair_distinct"] = distinct
    if dropped:
        logging.getLogger("dedupe_api_ray.blocking").warning(
            "candidate_pairs: dropped %d block keys above hard_cap=%d "
            "(%d member rows lose pair coverage); sample: %s",
            len(dropped), hard_cap,
            sum(capped[k] for k in dropped),
            sorted(dropped)[:5])
    if sampled:
        logging.getLogger("dedupe_api_ray.blocking").warning(
            "candidate_pairs: %d block keys above hard_cap=%d sampled "
            "down to ~%d members each (pair budget %d/key; %d total "
            "member rows; estimated within-key pair recall %.3g); "
            "sample: %s",
            len(sampled), hard_cap, m_tgt, max_sampled_pairs,
            sum(capped[k] for k in sampled),
            est_recall, sorted(sampled)[:5])
    _est_emit = all_pairs - tot_pairs \
        + (0.0 if hard_cap_mode == "drop" else kept_pairs)
    _bm_rows = blocking_map.count()  # free post-materialize
    if _est_emit > max(50_000_000, 50 * _bm_rows):
        # pair volume is quadratic in block size: a predicate whose
        # key cardinality does NOT grow with the corpus (url_host,
        # common integers) multiplies pairs 4x every time the corpus
        # doubles.  Surface the cost BEFORE the scoring stage pays it.
        logging.getLogger("dedupe_api_ray.blocking").warning(
            "candidate_pairs: ~%.2g candidate pairs expected from %d "
            "blocking rows (%.0fx) — quadratic mid-size blocks "
            "dominate; lower hard_cap (its pair budget then applies) "
            "or use more selective predicates",
            _est_emit, _bm_rows, _est_emit / max(1, _bm_rows))
    salt_ref = ray.put((salt_k, dropped, sampled))

    from dedupe_api_ray.utils import shuffle_partitions

    n_parts = shuffle_partitions()
    try:
        key_is_int = pa.types.is_integer(
            blocking_map.schema().base_schema.field("block_key").type)
    except Exception:  # schema-less empty input: dtype is moot
        key_is_int = False

    def _key_arr(batch: pa.Table) -> np.ndarray:
        # int64 LSH band keys stay int64 end-to-end (no string cast,
        # no object-array hashing); predicate keys stay strings
        if key_is_int:
            return batch["block_key"].to_numpy(zero_copy_only=False) \
                .astype(np.int64, copy=False)
        return np.asarray(batch["block_key"].to_pylist(), dtype=object)

    def _key_field() -> pa.DataType:
        return pa.int64() if key_is_int else pa.string()

    def _part_of(keys: np.ndarray,
                 salt_code: np.ndarray | None = None) -> np.ndarray:
        # deterministic key→partition hash (pandas stable hashing —
        # identical across processes/runs/platforms); the salt code is
        # mixed in so a salted mega-key's sub-blocks spread across
        # partitions instead of re-concentrating on one
        h = pd.util.hash_array(keys, categorize=False)
        if salt_code is not None:
            h = (h ^ (salt_code.astype(np.uint64)
                      * np.uint64(0x9E3779B97F4A7C15))) \
                * np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(31)
        return (h % np.uint64(n_parts)).astype(np.int64)

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", pa.array(_part_of(_key_arr(batch)), pa.int64()))

    def salt(batch: pa.Table) -> pa.Table:
        ks, dr, smp = ray.get(salt_ref)
        keys = _key_arr(batch)
        rids = batch["record_id"].to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        ser = pd.Series(keys)
        hot_mask = ser.isin(ks).to_numpy()
        drop_mask = (ser.isin(dr).to_numpy() if dr
                     else np.zeros(len(ser), bool))
        if smp:
            # deterministic uniform member sample of the over-cap keys:
            # keep iff mix(block_key, record_id) < rate — a pure per-row
            # function of the data, identical across runs/parallelism
            smp_mask = ser.isin(smp).to_numpy()
            if smp_mask.any():
                kh = pd.util.hash_array(keys[smp_mask], categorize=False)
                rh = (rids[smp_mask].astype(np.uint64)
                      * np.uint64(0x9E3779B97F4A7C15))
                mix = (kh ^ rh) * np.uint64(0xBF58476D1CE4E5B9)
                mix ^= mix >> np.uint64(31)
                rates = ser[smp_mask].map(smp).to_numpy(dtype=np.float64)
                keep = (mix % np.uint64(1 << 32)).astype(np.float64) \
                    < rates * float(1 << 32)
                cut = smp_mask.copy()
                cut[smp_mask] = ~keep  # sampled-OUT rows behave like drops
                hot_mask &= ~cut
                drop_mask |= cut
        plain = ~hot_mask & ~drop_mask
        n_plain = int(plain.sum())
        o_key = [keys[plain]]
        o_rid = [rids[plain]]
        o_side = [np.zeros(n_plain, np.int8)]
        o_code = [np.zeros(n_plain, np.int32)]
        # hot rows expand to k (sub-group) entries each, VECTORIZED per
        # distinct k: each row's salt s = rid % k meets every t<k in
        # sub-group (min(s,t), max(s,t)) → salt_code 1 + i*k + j.
        # side: 0 = diagonal (i, i) triangle member; cross groups tag
        # left = -1 / right = +1 so the pair emitter can tell a
        # one-sided cross segment (emits NOTHING — its within-sub
        # pairs belong to the diagonal groups) from a triangle.
        if hot_mask.any():
            hk = keys[hot_mask]
            hr = rids[hot_mask]
            kvals = pd.Series(hk).map(ks).to_numpy(dtype=np.int64)
            for k in np.unique(kvals):
                k = int(k)
                m = kvals == k
                rk, kk = hr[m], hk[m]
                s = rk % k
                for t in range(k):
                    i = np.minimum(s, t)
                    j = np.maximum(s, t)
                    o_key.append(kk)
                    o_rid.append(rk)
                    o_side.append(np.where(
                        i == j, 0, np.where(s == i, -1, 1)).astype(np.int8))
                    o_code.append((1 + i * k + j).astype(np.int32))
        keys_o = np.concatenate(o_key)
        code_o = np.concatenate(o_code)
        return pa.table({"block_key": pa.array(keys_o, _key_field()),
                         "record_id": pa.array(np.concatenate(o_rid)),
                         "side": pa.array(np.concatenate(o_side),
                                          pa.int8()),
                         "salt_code": pa.array(code_o, pa.int32()),
                         "__part": pa.array(_part_of(keys_o, code_o),
                                            pa.int64())})

    if not hot_counts:
        # no hot keys: skip the salting pass (one fewer full scan)
        salted = blocking_map.map_batches(add_part, batch_format="pyarrow")
    else:
        salted = blocking_map.map_batches(salt, batch_format="pyarrow")
    # ONE group per hash partition (not per block key): the vectorized
    # partition emitter does all per-key work in numpy
    pairs = salted.groupby("__part", num_partitions=n_parts).map_groups(
        _emit_pairs_partition, batch_format="pandas")
    if distinct == "local":
        # per-block dedup only (each block = one __part group, so all
        # same-partition duplicates — salted cross segments included —
        # die here); emit bare Arrow (no pandas schema metadata — it
        # makes the schema unhashable and spams reduce-side warnings,
        # same reason as distinct_pairs.bucket)
        def local_dedup(df: pd.DataFrame) -> pa.Table:
            df = df.drop_duplicates(["id_a", "id_b"])
            return pa.table({
                "id_a": pa.array(df["id_a"].to_numpy(), pa.int64()),
                "id_b": pa.array(df["id_b"].to_numpy(), pa.int64())})
        return pairs.map_batches(local_dedup, batch_format="pandas")
    return distinct_pairs(pairs)
