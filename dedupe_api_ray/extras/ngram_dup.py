"""Cross-document duplicate n-gram detection — the exact-substring-
dedup primitive for web-text training pipelines (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better": shared
w-token spans across documents are the unit of contamination that
document-level near-dup misses).

Operator: for every document, every distinct w-token shingle; a
shingle is DUPLICATED when it occurs in >= ``min_docs`` distinct
documents.  Output per document: total distinct shingles, duplicated
shingles, and the duplicated fraction — the per-doc statistic a
filter/removal policy keys on.

Scale shape (the 100-TB design):
- shingling is an actor-pool ``map_batches`` stage; token hashes are
  memoized per actor (web boilerplate hashes once per actor, not per
  doc) and shingle hashes come from ONE vectorized sliding-window
  polynomial + splitmix avalanche per doc — no per-shingle Python,
  no per-shingle string allocation;
- the doc-count is a single hash-partitioned groupby over (shingle,
  doc) rows that are already distinct-per-doc map-side;
- the flag attach is size-routed: a small duplicated-shingle set
  broadcasts once (``ray.put`` + sorted-array ``searchsorted``), a
  large one falls back to the hash join — the same routing the
  scoring/clustering stages use;
- per-doc totals pre-aggregate inside each batch (``np.unique`` +
  ``bincount``) before the final doc-keyed groupby, so the last
  shuffle moves one partial row per (batch, doc), not one per
  shingle.

The DuckDB oracle reproduces the counts exactly with string shingles
(``array_to_string(ts[i:i+w-1], ' ')``): the engine's 64-bit hashes
only collide with probability ~n^2/2^64, far below the oracle's
value-hash sensitivity at test scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from dedupe_api_ray.functions.text import TOKEN_RE

_MASK63 = np.uint64(0x7FFFFFFFFFFFFFFF)


def _avalanche(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — destroys the linear structure of the
    positional polynomial so truncated/summed hashes stay uniform."""
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


class ShingleEmitter:
    """Actor-pool stage: documents → one (h, doc_id) row per DISTINCT
    w-token shingle.  Token-level blake2b hashes are memoized per
    actor; shingle hashes are a vectorized rolling polynomial over the
    token-hash stream (``sliding_window_view`` × precomputed powers),
    avalanched — deterministic across actors, runs and parallelism."""

    _MEMO_CAP = 2_000_000

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 w: int = 8):
        import hashlib
        self.text_col, self.id_col, self.w = text_col, id_col, w
        self.memo: dict[str, int] = {}
        self._blake = hashlib.blake2b
        base = np.uint64(0x9E3779B97F4A7C15)
        pows = np.empty(w, dtype=np.uint64)
        pows[0] = 1
        with np.errstate(over="ignore"):
            for i in range(1, w):
                pows[i] = pows[i - 1] * base
        self.pows = pows[::-1].copy()

    def _tok_hashes(self, toks: list[str]) -> np.ndarray:
        out = np.empty(len(toks), dtype=np.uint64)
        memo, blake = self.memo, self._blake
        if len(memo) > self._MEMO_CAP:
            memo.clear()
        get = memo.get
        for i, t in enumerate(toks):
            h = get(t)
            if h is None:
                h = int.from_bytes(
                    blake(t.encode(), digest_size=8).digest(), "big")
                memo[t] = h
            out[i] = h
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = self.w
        hs: list[np.ndarray] = []
        dids: list[np.ndarray] = []
        ids = batch[self.id_col].to_pylist()
        for did, text in zip(ids, batch[self.text_col].to_pylist()):
            toks = TOKEN_RE.findall(text.lower()) if text else []
            if len(toks) < w:
                continue
            u = self._tok_hashes(toks)
            win = np.lib.stride_tricks.sliding_window_view(u, w)
            with np.errstate(over="ignore"):
                h = (win * self.pows).sum(axis=1, dtype=np.uint64)
            h = np.unique(_avalanche(h) & _MASK63)
            hs.append(h.astype(np.int64))
            dids.append(np.full(len(h), did, dtype=np.int64))
        if not hs:
            return pa.table({"h": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        return pa.table({"h": pa.array(np.concatenate(hs)),
                         "doc_id": pa.array(np.concatenate(dids))})


class PositionalShingles(ShingleEmitter):
    """Actor-pool stage: documents → one (doc_id, pos, h) row per
    WINDOW (positional, not distinct) — the removal pass needs every
    occurrence, because coverage is a union of [pos, pos+w) spans."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        w = self.w
        hs: list[np.ndarray] = []
        poss: list[np.ndarray] = []
        dids: list[np.ndarray] = []
        ids = batch[self.id_col].to_pylist()
        for did, text in zip(ids, batch[self.text_col].to_pylist()):
            toks = TOKEN_RE.findall(text.lower()) if text else []
            if len(toks) < w:
                continue
            u = self._tok_hashes(toks)
            win = np.lib.stride_tricks.sliding_window_view(u, w)
            with np.errstate(over="ignore"):
                h = (win * self.pows).sum(axis=1, dtype=np.uint64)
            h = (_avalanche(h) & _MASK63).astype(np.int64)
            hs.append(h)
            poss.append(np.arange(len(h), dtype=np.int64))
            dids.append(np.full(len(h), did, dtype=np.int64))
        if not hs:
            return pa.table({"h": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        return pa.table({"h": pa.array(np.concatenate(hs)),
                         "pos": pa.array(np.concatenate(poss)),
                         "doc_id": pa.array(np.concatenate(dids))})


def _rebuild_doc(toks: list[str], dup_pos: np.ndarray,
                 w: int) -> tuple[str, int]:
    """Drop every token covered by a duplicated window ([pos, pos+w)
    union, via a difference array — no per-window inner loop); returns
    (rebuilt text, n_removed)."""
    n = len(toks)
    if n == 0 or len(dup_pos) == 0:
        return " ".join(toks), 0
    delta = np.zeros(n + w + 1, dtype=np.int64)
    np.add.at(delta, dup_pos, 1)
    np.add.at(delta, dup_pos + w, -1)
    covered = np.cumsum(delta[:n]) > 0
    kept = np.array(toks, dtype=object)[~covered]
    return " ".join(kept.tolist()), int(covered.sum())


def _doc_partials(flagged: pa.Table) -> pa.Table:
    """Within-batch combiner: (doc_id, is_dup) rows → one partial
    (doc_id, n_shingles, n_dup) row per doc in the batch."""
    dids = flagged["doc_id"].to_numpy(zero_copy_only=False)
    dup = flagged["is_dup"].to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(dids, return_inverse=True)
    n_sh = np.bincount(inv, minlength=len(uniq))
    n_dup = np.bincount(inv, weights=dup, minlength=len(uniq))
    return pa.table({"doc_id": pa.array(uniq, pa.int64()),
                     "n_shingles": pa.array(n_sh, pa.int64()),
                     "n_dup": pa.array(n_dup.astype(np.int64), pa.int64())})


def _shingle_pairs(docs: ray.data.Dataset, text_col: str, id_col: str,
                   w: int, concurrency) -> ray.data.Dataset:
    """Materialized (h, doc_id) rows, one per DISTINCT shingle per
    doc — shared by the stats and removal operators."""
    from dedupe_api_ray.utils import actor_pool
    if concurrency is None:
        concurrency = actor_pool()
    return docs.map_batches(
        ShingleEmitter,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col, w=w),
        batch_format="pyarrow", concurrency=concurrency,
        num_cpus=1).materialize()


def _dup_set(pairs: ray.data.Dataset, min_docs: int) -> ray.data.Dataset:
    """Materialized single-column (h) set of shingles present in
    >= min_docs distinct documents."""
    from dedupe_api_ray.utils import shuffle_partitions
    counts = pairs.groupby(
        "h", num_partitions=shuffle_partitions()).count()
    return counts.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t["count()"], min_docs)).select(["h"]),
        batch_format="pyarrow").materialize()


def dup_ngram_stats(docs: ray.data.Dataset, text_col: str = "text",
                    id_col: str = "doc_id", w: int = 8, min_docs: int = 2,
                    concurrency: int | tuple | None = None
                    ) -> ray.data.Dataset:
    """Per-document duplicate-shingle statistics:
    (doc_id, n_shingles, n_dup, dup_fraction), one row per document
    with at least one shingle (>= w tokens).  ``dup_fraction`` is
    rounded half-away-from-zero at 6 dp (matches SQL ROUND)."""
    from dedupe_api_ray.utils import (default_num_partitions,
                                      round_half_away, should_broadcast,
                                      shuffle_partitions)
    pairs = _shingle_pairs(docs, text_col, id_col, w, concurrency)
    dup_set = _dup_set(pairs, min_docs)

    if should_broadcast(dup_set):
        tbl = pa.concat_tables(list(dup_set.iter_batches(
            batch_format="pyarrow", batch_size=1 << 20)))
        dup_sorted = np.sort(tbl["h"].to_numpy(zero_copy_only=False)) \
            if tbl.num_rows else np.zeros(0, dtype=np.int64)
        dup_ref = ray.put(dup_sorted)

        def flag_bcast(t: pa.Table) -> pa.Table:
            d = ray.get(dup_ref)
            h = t["h"].to_numpy(zero_copy_only=False)
            if len(d):
                pos = np.searchsorted(d, h)
                pos = np.minimum(pos, len(d) - 1)
                is_dup = (d[pos] == h).astype(np.int64)
            else:
                is_dup = np.zeros(len(h), dtype=np.int64)
            return _doc_partials(pa.table({
                "doc_id": t["doc_id"],
                "is_dup": pa.array(is_dup, pa.int64())}))

        partials = pairs.map_batches(flag_bcast, batch_format="pyarrow")
    else:
        # scale path: hash-join the duplicated-shingle set onto the
        # pair rows (left join via dup marker column)
        marked = dup_set.map_batches(
            lambda t: t.append_column(
                "is_dup", pa.array(np.ones(t.num_rows, np.int64))),
            batch_format="pyarrow")
        joined = pairs.join(marked, join_type="left_outer",
                            num_partitions=default_num_partitions(),
                            on=("h",))
        partials = joined.map_batches(
            lambda t: _doc_partials(pa.table({
                "doc_id": t["doc_id"],
                "is_dup": pc.fill_null(t["is_dup"], 0)})),
            batch_format="pyarrow")

    agg = partials.groupby(
        "doc_id", num_partitions=shuffle_partitions()).aggregate(
        Sum("n_shingles", alias_name="n_shingles"),
        Sum("n_dup", alias_name="n_dup"))

    def finish(t: pa.Table) -> pa.Table:
        n_sh = t["n_shingles"].to_numpy(zero_copy_only=False)
        n_dup = t["n_dup"].to_numpy(zero_copy_only=False)
        frac = round_half_away(
            n_dup / np.maximum(n_sh, 1).astype(np.float64), 6)
        return pa.table({"doc_id": t["doc_id"],
                         "n_shingles": pa.array(n_sh, pa.int64()),
                         "n_dup": pa.array(n_dup, pa.int64()),
                         "dup_fraction": pa.array(frac, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


class DupSpanRemover(ShingleEmitter):
    """Actor-pool removal stage (broadcast path): rewrite each doc
    with every token covered by a duplicated w-shingle removed.  The
    sorted duplicated-hash array ships ONCE per actor via ``ray.get``
    of a ``ray.put`` ref in ``__init__``."""

    def __init__(self, dup_ref, text_col: str = "text",
                 id_col: str = "doc_id", w: int = 8):
        super().__init__(text_col=text_col, id_col=id_col, w=w)
        self.dup = ray.get(dup_ref)  # sorted int64 hashes

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        w, d = self.w, self.dup
        ids = batch[self.id_col].to_pylist()
        n_tok = np.empty(len(ids), dtype=np.int64)
        n_rem = np.empty(len(ids), dtype=np.int64)
        texts: list[str] = []
        for k, text in enumerate(batch[self.text_col].to_pylist()):
            toks = TOKEN_RE.findall(text.lower()) if text else []
            n_tok[k] = len(toks)
            if len(toks) < w or len(d) == 0:
                texts.append(" ".join(toks))
                n_rem[k] = 0
                continue
            u = self._tok_hashes(toks)
            win = np.lib.stride_tricks.sliding_window_view(u, w)
            with np.errstate(over="ignore"):
                h = (win * self.pows).sum(axis=1, dtype=np.uint64)
            h = (_avalanche(h) & _MASK63).astype(np.int64)
            pos = np.minimum(np.searchsorted(d, h), len(d) - 1)
            dup_pos = np.flatnonzero(d[pos] == h)
            rebuilt, nr = _rebuild_doc(toks, dup_pos, w)
            texts.append(rebuilt)
            n_rem[k] = nr
        return pa.table({"doc_id": batch[self.id_col],
                         "n_tokens": pa.array(n_tok, pa.int64()),
                         "n_removed": pa.array(n_rem, pa.int64()),
                         "text_dedup": pa.array(texts, pa.string())})


def _removal_partition(g: pa.Table, w: int) -> pa.Table:
    """Shuffle-path kernel: one partition holds, per doc, its single
    text row (side 1) plus its duplicated-window position rows
    (side 0); rebuilds each doc in one pass."""
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_tokens": pa.array([], pa.int64()),
                      "n_removed": pa.array([], pa.int64()),
                      "text_dedup": pa.array([], pa.string())})
    if g.num_rows == 0:
        return empty
    side = g["__side"].to_numpy(zero_copy_only=False)
    doc = g["doc_id"].to_numpy(zero_copy_only=False)
    pos = pc.fill_null(g["pos"], -1).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    order = np.lexsort((side, doc))
    ds_, ss_, ps_ = doc[order], side[order], pos[order]
    starts = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
    ends = np.r_[starts[1:], len(ds_)]
    text_col = g["text"]
    out_doc, out_nt, out_nr, out_tx = [], [], [], []
    for s, e in zip(starts, ends):
        seg_sides = ss_[s:e]
        t_idx = np.flatnonzero(seg_sides == 1)
        if len(t_idx) != 1:
            raise RuntimeError(
                "remove_dup_ngrams: expected exactly one text row per "
                f"doc in partition, got {len(t_idx)} for doc {ds_[s]} "
                "(duplicate doc ids in the input?)")
        text = text_col[order[s + t_idx[0]]].as_py()
        dup_pos = ps_[s:e][seg_sides == 0]
        toks = TOKEN_RE.findall(text.lower()) if text else []
        rebuilt, nr = _rebuild_doc(toks, dup_pos, w)
        out_doc.append(int(ds_[s]))
        out_nt.append(len(toks))
        out_nr.append(nr)
        out_tx.append(rebuilt)
    return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                     "n_tokens": pa.array(out_nt, pa.int64()),
                     "n_removed": pa.array(out_nr, pa.int64()),
                     "text_dedup": pa.array(out_tx, pa.string())})


def remove_dup_ngrams(docs: ray.data.Dataset, text_col: str = "text",
                      id_col: str = "doc_id", w: int = 8,
                      min_docs: int = 2,
                      concurrency: int | tuple | None = None,
                      num_partitions: int | None = None
                      ) -> ray.data.Dataset:
    """Exact-substring dedup REWRITE (Lee et al. 2022's removal step,
    at w-token granularity): every token covered by a w-shingle that
    occurs in >= ``min_docs`` distinct documents is removed from EVERY
    document (the symmetric remove-all policy — deterministic and
    order-free, unlike keep-first, which would depend on a global doc
    order).  Output per doc: (doc_id, n_tokens, n_removed,
    text_dedup), with text_dedup the kept tokens joined by single
    spaces (tokenization is the engine-wide TOKEN_RE, lowercased).

    Scale shape: dup-shingle set from the same map-combined groupby as
    dup_ngram_stats; the attach is size-routed — small sets broadcast
    into an actor pool (one rewrite pass over the corpus), large sets
    hash-join positional window rows and regroup by doc (text ships
    through ONE shuffle).  Both paths produce identical output
    (equivalence-tested)."""
    from dedupe_api_ray.utils import (actor_pool, default_num_partitions,
                                      should_broadcast,
                                      shuffle_partitions)
    if concurrency is None:
        concurrency = actor_pool()
    pairs = _shingle_pairs(docs, text_col, id_col, w, concurrency)
    dup_set = _dup_set(pairs, min_docs)

    if should_broadcast(dup_set):
        tbl = pa.concat_tables(list(dup_set.iter_batches(
            batch_format="pyarrow", batch_size=1 << 20)))
        dup_sorted = np.sort(tbl["h"].to_numpy(zero_copy_only=False)) \
            if tbl.num_rows else np.zeros(0, dtype=np.int64)
        dup_ref = ray.put(dup_sorted)
        return docs.map_batches(
            DupSpanRemover,
            fn_constructor_kwargs=dict(dup_ref=dup_ref, text_col=text_col,
                                       id_col=id_col, w=w),
            batch_format="pyarrow", concurrency=concurrency, num_cpus=1)

    # scale path: inner-join positional windows against the dup set,
    # then regroup (dup positions + the doc's text row) by doc id
    n_parts = shuffle_partitions(num_partitions)
    wins = docs.map_batches(
        PositionalShingles,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col, w=w),
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1)
    dup_pos = wins.join(dup_set, join_type="inner",
                        num_partitions=default_num_partitions(),
                        on=("h",))

    def tag(t: pa.Table, side: int) -> pa.Table:
        # pd.util.hash_array, NOT (id * C) % n — the multiply is a
        # bijection mod 2^m, so its low bits are a pure function of
        # id mod n_parts and strided doc ids would collapse into one
        # partition (same reasoning as the join family's tag)
        from dedupe_api_ray.stages.asof import _key_partition
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        part = _key_partition(did, n_parts)
        n = t.num_rows
        return pa.table({
            "doc_id": t["doc_id"],
            "pos": t["pos"] if side == 0 else pa.nulls(n, pa.int64()),
            "text": pa.nulls(n, pa.string()) if side == 0
            else pc.cast(t[text_col], pa.string()),
            "__side": pa.array(np.full(n, side, np.int8), pa.int8()),
            "__part": pa.array(part, pa.int64())})

    side0 = dup_pos.map_batches(lambda t: tag(t, 0),
                                batch_format="pyarrow")
    side1 = docs.map_batches(lambda t: tag(t, 1), batch_format="pyarrow")

    def kernel(g: pa.Table) -> pa.Table:
        return _removal_partition(g, w)

    return side0.union(side1) \
        .groupby("__part", num_partitions=n_parts) \
        .map_groups(kernel, batch_format="pyarrow")
