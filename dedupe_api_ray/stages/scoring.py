"""Pair scoring: payload join + stateful PairScorer actor pool.

Reference (†): dedupe:dedupe/core.py::scoreDuplicates / ScoreDupes —
multiprocessing workers pulling pair chunks from a queue, classifier +
C distance kernels loaded per worker, scores into a numpy memmap.

Ray shape (BASELINE.json north_star "stateful actor pools holding the
trained classifier and distance kernels"): the model artifact is
``ray.put`` once; each PairScorer actor unpickles it in ``__init__``;
``map_batches`` streams Arrow pair batches through the pool and emits
(id_a, id_b, score: float32).

Payload attachment (J3 — the widest shuffle in the pipeline): by
default a hash-partitioned ``Dataset.join`` of pairs against the
records table on each side; when the records table is small enough it
is broadcast (``ray.put`` once, dict lookup per batch) instead of
shuffled — the small-side-broadcast rule from SURVEY.md §2.5.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from dedupe_api_ray.model import Model


def _checked_positions(sorted_rid: np.ndarray, ids: np.ndarray,
                       who: str) -> np.ndarray:
    """searchsorted with a membership check: a pair id absent from the
    records table must fail LOUDLY — an unchecked insertion point
    silently gathers the NEXT record's payload and produces a
    plausible but wrong score (the sidecar path verifies rid equality;
    the payload gathers must too)."""
    pos = np.searchsorted(sorted_rid, ids)
    pos = np.minimum(pos, max(len(sorted_rid) - 1, 0))
    if len(sorted_rid) == 0 or not np.array_equal(sorted_rid[pos], ids):
        missing = (ids if len(sorted_rid) == 0
                   else ids[sorted_rid[pos] != ids])
        raise KeyError(
            f"{who}: {len(missing)} pair id(s) missing from the records "
            f"table (e.g. {missing[:3].tolist()}); pairs must reference "
            "only ids present in the payload records")
    return pos


def _payload_columns(model: Model,
                     exclude: set[str] | frozenset = frozenset()
                     ) -> list[str]:
    """Columns shipped with each pair.  Token list columns are NOT
    shipped: converting list<string> Arrow columns to Python per batch
    dominated scoring cost, and the scorer's per-record TF cache makes
    re-tokenizing on (rare) cache misses cheaper than shipping tokens
    with every pair.

    ``exclude`` drops fields whose distance the scorer computes from
    the TF sidecar (Text cosine): shipping the raw value with every
    pair multiplies the corpus text by pairs-per-record through the
    object store — at 237k web pages / 16.7M candidate pairs the
    attach stage spent 344 s spilling ~23 GiB of never-read
    a_text/b_text columns."""
    cols: list[str] = []
    for f in model.field_defs:
        if f.type == "Interaction":
            continue
        cols.append(f.field)
    seen: set[str] = set()
    return [c for c in cols
            if c not in exclude and not (c in seen or seen.add(c))]


def attach_payload(pairs: ray.data.Dataset, records: ray.data.Dataset,
                   model: Model, num_partitions: int | None = None,
                   broadcast_threshold: int = 2_000_000,
                   broadcast_max_bytes: int = 1 << 30,
                   exclude_fields: set[str] | frozenset = frozenset()
                   ) -> ray.data.Dataset:
    """pairs (id_a, id_b) → pairs with a_<field> / b_<field> columns.

    Payload routing is by BYTES as well as rows (utils
    .should_broadcast): a records side past ~1 GiB takes the two-sided
    hash join even when its row count is modest (wide web documents),
    so no single ``ray.put`` object can crowd the object store.

    ``exclude_fields``: fields whose distances come from the TF
    sidecar — their raw values are never read by the scorer, so they
    must not be multiplied by pairs-per-record here (see
    _payload_columns)."""
    from dedupe_api_ray.utils import default_num_partitions, should_broadcast
    num_partitions = default_num_partitions(num_partitions)
    cols = _payload_columns(model, exclude=exclude_fields)
    if should_broadcast(records, broadcast_threshold, broadcast_max_bytes):
        payload_tbl = pa.concat_tables(
            [b for b in records.select_columns(["record_id", *cols])
             .iter_batches(batch_format="pyarrow", batch_size=65536)]
        )
        lookup_ref = ray.put(payload_tbl)

        class AttachBroadcast:
            def __init__(self):
                tbl = ray.get(lookup_ref)
                rid = tbl["record_id"].to_numpy(zero_copy_only=False)
                order = np.argsort(rid, kind="stable")
                self.sorted_rid = rid[order]
                self.tbl = tbl.take(pa.array(order))

            def __call__(self, batch: pa.Table) -> pa.Table:
                out = {"id_a": batch["id_a"], "id_b": batch["id_b"]}
                for side in ("a", "b"):
                    ids = batch[f"id_{side}"].to_numpy(zero_copy_only=False)
                    pos = _checked_positions(self.sorted_rid, ids,
                                             "attach_payload")
                    take = pa.array(pos)
                    for c in cols:
                        out[f"{side}_{c}"] = self.tbl[c].take(take)
                return pa.table(out)

        from dedupe_api_ray.utils import actor_pool
        return pairs.map_batches(AttachBroadcast, batch_format="pyarrow",
                                 concurrency=actor_pool(), num_cpus=1)

    # large side: two hash-partitioned joins.  Arrow's hash join
    # rejects list<> payload columns, so token columns stay behind and
    # the scorer re-tokenizes per batch (DataModel falls back when a
    # __tokens column is absent).
    cols = [c for c in cols if not c.endswith("__tokens")]

    def rename(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            data = {f"id_{side}": batch["record_id"]}
            for c in cols:
                data[f"{side}_{c}"] = batch[c]
            return pa.table(data)
        return fn

    rec_a = records.select_columns(["record_id", *cols]) \
        .map_batches(rename("a"), batch_format="pyarrow")
    rec_b = records.select_columns(["record_id", *cols]) \
        .map_batches(rename("b"), batch_format="pyarrow")
    joined = pairs.join(rec_a, join_type="inner",
                        num_partitions=num_partitions, on=("id_a",))
    joined = joined.join(rec_b, join_type="inner",
                         num_partitions=num_partitions, on=("id_b",))
    return joined




# ---------------------------------------------------------------------------
# TF-stats sidecar: per-record cosine state computed ONCE (distributed)
# and broadcast, instead of per actor.  Without it every scorer actor
# rebuilt token stats for every record it saw (cost x actor count).
# Values are exact up to float summation order (sorted-hash vs token
# order); parity tests use 1e-5 tolerance.
# ---------------------------------------------------------------------------


def _hash_tokens_batch(lists: list[list[str]], idf: dict | None,
                       memo: dict) -> tuple[list, list, list]:
    import hashlib

    out_h, out_w, out_n = [], [], []
    for toks in lists:
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        hs = np.empty(len(tf), dtype=np.uint64)
        ws = np.empty(len(tf), dtype=np.float64)
        for i, (t, f) in enumerate(tf.items()):
            h = memo.get(t)
            if h is None:
                h = int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
                memo[t] = h
            hs[i] = h
            ws[i] = f * (idf.get(t, 1.0) if idf is not None else 1.0)
        order = np.argsort(hs)
        hs, ws = hs[order], ws[order]
        norm = float(np.sqrt((ws * ws).sum()))
        out_h.append(hs.astype(np.int64).tolist())
        out_w.append(ws.tolist())
        out_n.append(norm)
    return out_h, out_w, out_n


def _assemble_shard(g) -> pa.Table:
    """One rid-hash shard of per-record TF stats → ONE row of flat
    binary blobs (sorted rid, offsets, token hashes, weights, norms).
    Runs INSIDE a Ray map_groups task — the driver never touches the
    data, only ObjectRefs to the resulting block tables."""
    rid = g["record_id"].to_numpy().astype(np.int64)
    order = np.argsort(rid, kind="stable")
    hlists = g["hashes"].to_numpy()
    wlists = g["weights"].to_numpy()
    lens = np.fromiter((len(hlists[k]) for k in order),
                       dtype=np.int64, count=len(order))
    offsets = np.zeros(len(order) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat_h = np.empty(int(offsets[-1]), dtype=np.uint64)
    flat_w = np.empty(int(offsets[-1]), dtype=np.float64)
    for j, k in enumerate(order):
        flat_h[offsets[j]:offsets[j + 1]] = np.asarray(
            hlists[k], dtype=np.int64).astype(np.uint64)
        flat_w[offsets[j]:offsets[j + 1]] = np.asarray(wlists[k])
    norms = g["norm"].to_numpy().astype(np.float64)[order]
    # per-shard token vocabulary + per-token RANKS: the scorer's
    # merge-intersect packs (pair, rank) into ONE uint64 searchsorted
    # key — a 4-byte rank gather plus one binary search replaces the
    # two-key int64 lexsort over every gathered token (the radix sort
    # passes were the scoring stage's dominant memory traffic)
    vocab, inv = np.unique(flat_h, return_inverse=True)
    ranks = inv.astype(np.uint32)
    return pa.table({
        "shard": pa.array([int(g["shard"].iloc[0])], pa.int64()),
        "rid": pa.array([rid[order].tobytes()], pa.large_binary()),
        "offsets": pa.array([offsets.tobytes()], pa.large_binary()),
        "hashes": pa.array([flat_h.tobytes()], pa.large_binary()),
        "weights": pa.array([flat_w.tobytes()], pa.large_binary()),
        "norms": pa.array([norms.tobytes()], pa.large_binary()),
        "vocab": pa.array([vocab.tobytes()], pa.large_binary()),
        "ranks": pa.array([ranks.tobytes()], pa.large_binary()),
    })


def build_tf_sidecar(records: ray.data.Dataset, model: Model,
                     num_shards: int | None = None):
    """For each Text field: compute (sorted token hashes, idf-weighted
    counts, norm) per record in a distributed pass, then assemble flat
    numpy arrays per rid-hash SHARD inside map_groups tasks.  The
    driver only ever holds ObjectRefs to the shard block tables —
    no whole-corpus driver-side assembly, no single giant object.
    Scorer actors ray.get the shard tables (zero-copy plasma reads —
    np.frombuffer views over shared buffers, no per-actor rebuild).
    Returns {field: {"k": K, "refs": [ObjectRef[pa.Table]]}} or None
    if the model has no Text fields."""
    from dedupe_api_ray.functions.text import tokens_of
    from dedupe_api_ray.utils import shuffle_partitions

    text_fields = [f.field for f in model.field_defs if f.type == "Text"]
    if not text_fields:
        return None
    n_records = records.count()
    if num_shards is None:
        # ~15k records per shard so the shard shuffle + assembly use
        # the cluster (5 shards at 237k records made the whole sidecar
        # build run on 5 tasks — ~11 s of CPU-count-independent wall),
        # capped at 16: the scorer splits each pair batch into
        # (shard_a, shard_b) combo segments, and k^2 segments per
        # 4096-pair batch must stay coarse enough to amortize the
        # per-segment numpy overhead (16^2=256 → ~16 pairs/segment).
        num_shards = max(1, min(shuffle_partitions(), 16,
                                n_records // 15_000 + 1))
    refs = {}
    for field in text_fields:
        idf = model.idf.get(field)
        idf_ref = ray.put(idf)

        def stats_batch(t: pa.Table, _field=field) -> pa.Table:
            _idf = ray.get(idf_ref)
            memo: dict = {}
            tok_col = f"{_field}__tokens"
            if tok_col in t.column_names:
                lists = t[tok_col].to_pylist()
            else:
                lists = [tokens_of(v) if v else []
                         for v in t[_field].to_pylist()]
            hs, ws, ns = _hash_tokens_batch(lists, _idf, memo)
            rid = t["record_id"].to_numpy(zero_copy_only=False)
            return pa.table({
                "record_id": t["record_id"],
                "shard": pa.array((rid % num_shards).astype(np.int64)),
                "hashes": pa.array(hs, pa.list_(pa.int64())),
                "weights": pa.array(ws, pa.list_(pa.float64())),
                "norm": pa.array(ns, pa.float64()),
            })

        shards = records.map_batches(stats_batch, batch_format="pyarrow") \
            .groupby("shard", num_partitions=num_shards) \
            .map_groups(_assemble_shard, batch_format="pandas")
        refs[field] = {"k": num_shards,
                       "refs": shards.materialize().to_arrow_refs()}
    return refs


class PairScorer:
    """A1 (†): classifier + distance kernels held per actor.

    Text-field cosine takes a cached fast path: per-record TF stats
    (counts + norm) are memoized by record id in the actor, because a
    record appears in many candidate pairs — rebuilding a Counter per
    PAIR dominated scoring cost otherwise.  Cache values are exact
    (kernels.cosine_from_stats is bit-identical to the uncached
    kernel), so scores are unchanged."""

    _CACHE_CAP = 500_000  # per-actor entries; cleared when exceeded

    def __init__(self, model_ref, sidecar_refs=None, payload_ref=None,
                 payload_cols=None):
        self.model: Model = ray.get(model_ref) if isinstance(
            model_ref, ray.ObjectRef) else model_ref
        self.dm = self.model.data_model()
        self.cols = _payload_columns(self.model)  # batch may lack some
        self.text_fields = [f.field for f in self.model.field_defs
                            if f.type == "Text"]
        self._tf_cache: dict[tuple[str, int], tuple] = {}
        # fused broadcast payload: when the records side is small the
        # scorer gathers a_/b_ columns ITSELF (sorted-rid searchsorted
        # over a zero-copy plasma table) instead of a separate
        # AttachBroadcast pool — two chained full-size actor pools
        # oversubscribed the CPUs 2x and pushed every pair's payload
        # through the object store once more (measured 132 CPU-s +
        # half the scoring-stage thrash at 474k pages / 77M pairs).
        self.payload = None
        if payload_ref is not None:
            tbl = ray.get(payload_ref)
            rid = tbl["record_id"].to_numpy(zero_copy_only=False)
            order = np.argsort(rid, kind="stable")
            self.payload = (rid[order], tbl.take(pa.array(order)),
                            list(payload_cols or []))
        # sidecar: shared per-record cosine state, rid-hash-sharded.
        # ray.get of the shard block tables is a zero-copy plasma read;
        # np.frombuffer views the shared buffers — no per-actor rebuild.
        self.sidecar = {}
        if sidecar_refs:
            for field, meta in sidecar_refs.items():
                shards: dict[int, tuple] = {}
                for tbl in ray.get(list(meta["refs"])):
                    for i in range(len(tbl)):
                        shards[int(tbl["shard"][i].as_py())] = (
                            np.frombuffer(tbl["rid"][i].as_buffer(),
                                          dtype=np.int64),
                            np.frombuffer(tbl["offsets"][i].as_buffer(),
                                          dtype=np.int64),
                            np.frombuffer(tbl["hashes"][i].as_buffer(),
                                          dtype=np.uint64),
                            np.frombuffer(tbl["weights"][i].as_buffer(),
                                          dtype=np.float64),
                            np.frombuffer(tbl["norms"][i].as_buffer(),
                                          dtype=np.float64),
                            np.frombuffer(tbl["vocab"][i].as_buffer(),
                                          dtype=np.uint64),
                            np.frombuffer(tbl["ranks"][i].as_buffer(),
                                          dtype=np.uint32),
                        )
                self.sidecar[field] = {"k": meta["k"], "shards": shards}

    @staticmethod
    def _expand(offs, lens, ja, valid):
        """Flat gather indices for the valid pairs' token segments."""
        L = lens[valid]
        starts = offs[ja[valid]]
        tot = int(L.sum())
        if tot == 0:
            return (np.zeros(0, np.int64), np.zeros(0, np.int64))
        base = np.concatenate([[0], np.cumsum(L)[:-1]])
        gather = np.repeat(starts - base, L) + np.arange(tot)
        pair_local = np.repeat(np.arange(len(L)), L)
        return gather, pair_local

    def _cosine_group(self, out, seg, ga, gb, sa, sb) -> None:
        """Vectorized cosine for one (shard_a, shard_b) pair group.

        Intersection shape: each record's tokens are stored sorted, so
        the a-side gathered as ``(pair_local << 32) | (rank << 1)`` is
        a GLOBALLY sorted uint64 key array, and one ``searchsorted``
        of the b-side keys (b hashes translated into a's per-shard
        rank space; non-members get odd keys that can never match)
        finds every common token.  This replaces the earlier two-key
        int64 lexsort over all gathered tokens — the radix-sort passes
        were the scoring stage's dominant memory traffic — with a
        4-byte rank gather and binary searches.  Matched products are
        accumulated per pair in ascending-hash order (b-side storage
        order), the SAME summation order as the lexsort merge, so
        scores are bit-identical."""
        rid_a, offs_a, fh_a, fw_a, norms_a, voc_a, frk_a = sa
        rid_b, offs_b, fh_b, fw_b, norms_b, voc_b, frk_b = sb
        ja = np.searchsorted(rid_a, ga)
        jb = np.searchsorted(rid_b, gb)
        ok_a = (ja < len(rid_a)) & (rid_a[np.minimum(ja, len(rid_a) - 1)] == ga)
        ok_b = (jb < len(rid_b)) & (rid_b[np.minimum(jb, len(rid_b) - 1)] == gb)
        ja = np.minimum(ja, len(rid_a) - 1)
        jb = np.minimum(jb, len(rid_b) - 1)
        lens_a = offs_a[ja + 1] - offs_a[ja]
        lens_b = offs_b[jb + 1] - offs_b[jb]
        valid = ok_a & ok_b & (lens_a > 0) & (lens_b > 0)
        if not valid.any():
            return
        idx = seg[valid]
        gather_a, pe_a = self._expand(offs_a, lens_a, ja, valid)
        gather_b, pe_b = self._expand(offs_b, lens_b, jb, valid)
        ka = ((pe_a.astype(np.uint64) << np.uint64(32))
              | (frk_a[gather_a].astype(np.uint64) << np.uint64(1)))
        if sa is sb:
            rb = frk_b[gather_b].astype(np.uint64) << np.uint64(1)
        else:
            bh = fh_b[gather_b]
            pv = np.searchsorted(voc_a, bh)
            pv = np.minimum(pv, len(voc_a) - 1)
            nonmem = voc_a[pv] != bh
            rb = ((pv.astype(np.uint64) << np.uint64(1))
                  | nonmem.astype(np.uint64))
        kb = (pe_b.astype(np.uint64) << np.uint64(32)) | rb
        pos = np.searchsorted(ka, kb)
        pos = np.minimum(pos, len(ka) - 1)
        m = ka[pos] == kb
        num = np.zeros(len(idx), dtype=np.float64)
        if m.any():
            num = np.bincount(
                pe_b[m], weights=fw_a[gather_a[pos[m]]] * fw_b[gather_b[m]],
                minlength=len(idx))
        v = num / (norms_a[ja[valid]] * norms_b[jb[valid]])
        np.minimum(v, 1.0, out=v)
        out[idx] = v

    def _cosine_sidecar(self, field: str, batch: pa.Table) -> np.ndarray:
        sc = self.sidecar[field]
        k, shards = sc["k"], sc["shards"]
        ids_a = batch["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids_b = batch["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids_a)
        out = np.full(n, np.nan, dtype=np.float64)
        if n == 0:
            return out
        sh_a = ids_a % k
        sh_b = ids_b % k
        if k == 1:  # common small-corpus case: one group, no split
            sa = shards.get(0)
            if sa is not None:
                self._cosine_group(out, np.arange(n), ids_a, ids_b, sa, sa)
            return out
        combo = sh_a * k + sh_b
        order = np.argsort(combo, kind="stable")
        bounds = np.nonzero(np.diff(combo[order]))[0] + 1
        for seg in np.split(order, bounds):
            sa = shards.get(int(sh_a[seg[0]]))
            sb = shards.get(int(sh_b[seg[0]]))
            if sa is None or sb is None:
                continue
            self._cosine_group(out, seg, ids_a[seg], ids_b[seg], sa, sb)
        return out

    def _cosine_col(self, field: str, batch: pa.Table,
                    recs_a: dict, recs_b: dict) -> np.ndarray | None:
        """Cosine column for one Text field — from the sidecar when it
        covers the field, else from the gathered values (fused payload
        OR attached a_/b_ columns; pre-tokenized __tokens columns are
        used when present).  Returns None when NEITHER source carries
        the field, so DataModel.distances raises its descriptive
        missing-payload error instead of a bare KeyError here."""
        if field in self.sidecar:
            return self._cosine_sidecar(field, batch)
        val_a = recs_a.get(field)
        val_b = recs_b.get(field)
        if val_a is None or val_b is None:
            return None
        from dedupe_api_ray.functions.kernels import (cosine_from_stats,
                                                      tf_stats)
        from dedupe_api_ray.functions.text import tokens_of

        idf = self.model.idf.get(field)
        ids_a = batch["id_a"].to_pylist()
        ids_b = batch["id_b"].to_pylist()
        tok_a = recs_a.get(f"{field}__tokens")
        tok_b = recs_b.get(f"{field}__tokens")
        if len(self._tf_cache) > self._CACHE_CAP:
            self._tf_cache.clear()
        cache = self._tf_cache
        n = len(ids_a)
        out = np.full(n, np.nan, dtype=np.float64)
        for i in range(n):
            stats = []
            for rid, toks, val in ((ids_a[i], tok_a, val_a),
                                   (ids_b[i], tok_b, val_b)):
                key = (field, rid)
                st = cache.get(key)
                if st is None:
                    tl = toks[i] if toks is not None else tokens_of(val[i])
                    st = tf_stats(tl, idf)
                    cache[key] = st
                stats.append(st)
            (ca, na), (cb, nb) = stats
            if not ca or not cb:
                continue  # NaN: missing side
            out[i] = cosine_from_stats(ca, na, cb, nb, idf)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        recs_a: dict[str, list] = {}
        recs_b: dict[str, list] = {}
        if self.payload is not None:
            sorted_rid, ptbl, pcols = self.payload
            for side in ("a", "b"):
                ids = batch[f"id_{side}"].to_numpy(zero_copy_only=False)
                take = pa.array(_checked_positions(sorted_rid, ids,
                                                   "PairScorer payload"))
                recs = recs_a if side == "a" else recs_b
                for c in pcols:
                    recs[c] = ptbl[c].take(take).to_pylist()
        names = set(batch.column_names)
        for c in self.cols:
            if f"a_{c}" not in names:
                continue  # token cols absent on the join path
            recs_a[c] = batch[f"a_{c}"].to_pylist()
            recs_b[c] = batch[f"b_{c}"].to_pylist()
        precomputed = {}
        for f in self.text_fields:
            d = self._cosine_col(f, batch, recs_a, recs_b)
            if d is not None:
                precomputed[f] = d
        # n explicit: a Text-only model whose single field is sidecar-
        # covered ships NO a_/b_ columns at all (recs_a empty)
        x = self.dm.distances(recs_a, recs_b, precomputed=precomputed,
                              n=len(batch))
        score = self.model.predict_proba(x).astype(np.float32)
        return pa.table({
            "id_a": batch["id_a"],
            "id_b": batch["id_b"],
            "score": pa.array(score, pa.float32()),
        })


def score_pairs(pairs_with_payload: ray.data.Dataset, model: Model,
                concurrency: int | tuple | None = None,
                batch_size: int = 4096,
                sidecar_refs=None, payload_ref=None,
                payload_cols=None) -> ray.data.Dataset:
    """``payload_ref``/``payload_cols``: fused broadcast-payload mode —
    the input carries bare (id_a, id_b) pairs and each scorer actor
    gathers the record columns itself (see PairScorer.__init__)."""
    from dedupe_api_ray.utils import actor_pool
    if concurrency is None:
        concurrency = actor_pool()
    model_ref = ray.put(model)
    return pairs_with_payload.map_batches(
        PairScorer, fn_constructor_kwargs={"model_ref": model_ref,
                                           "sidecar_refs": sidecar_refs,
                                           "payload_ref": payload_ref,
                                           "payload_cols": payload_cols},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
