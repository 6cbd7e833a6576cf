"""The flagship pipeline: ``partition`` — dedupe a Dataset of records.

Mirrors dedupe:dedupe/api.py::Dedupe.partition † (E3 flow, SURVEY.md
§3): pairs(data) → score(pairs) → cluster(scores, threshold), with the
dedupe-api exact-duplicate collapse (M5 †: identical records are
grouped by content hash first, only representatives enter fuzzy
matching, duplicates rejoin afterwards).

Every stage is a Ray Data transform; each can checkpoint to
per-partition Parquet with a lineage manifest (state.checkpoint) so a
run resumes mid-pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from dedupe_api_ray.model import Model
from dedupe_api_ray.stages.blocking import (add_tokens, candidate_pairs,
                                            fingerprint_records,
                                            prepare_records)
from dedupe_api_ray.stages.clustering import cluster_scored_pairs
from dedupe_api_ray.stages.scoring import attach_payload, score_pairs
from dedupe_api_ray.state.checkpoint import CheckpointManager, fingerprint_of

# max hashed-row count for the driver-side exact-collapse rep-min
# (narrow (row_hash, id) projection, <= ~200 MB); module-level so tests
# can force the shuffle-groupby scale path on small fixtures
COLLAPSE_DRIVER_MAX = 5_000_000


def add_row_hash(ds: ray.data.Dataset, fields: list[str],
                 out_col: str = "row_hash") -> ray.data.Dataset:
    """M5 †: content hash over the declared fields (post-normalize).

    The key is 128 bits as a 32-char hex string: TWO independent
    64-bit keyed hashes (``pandas.util.hash_array`` siphash with two
    distinct hash keys) of the same injective row encoding (birthday
    bound ~1.8e19 rows — safely past the 1e12-doc target, where a
    single 64-bit key would collide from ~5e9 rows).  A string key
    keeps the collapse on Ray-native groupby/join kernels; the 32-byte
    shuffle payload is the price of collision safety.

    Fully vectorized: the row encoding is Arrow kernels (null-flag +
    string cast per field, one binary_join_element_wise), the digest
    is two C-level hash_array passes + one whole-buffer hexlify — the
    r4 version ran a Python blake2b per row over the whole corpus (the
    last corpus-wide Python loop, VERDICT r4).  Fields Arrow cannot
    cast to string (nested lists etc.) fall back to a repr path."""
    import binascii

    import pandas as pd

    def fn(batch: pa.Table) -> pa.Table:
        parts: list = []
        for f in fields:
            col = batch[f]
            try:
                val = pc.fill_null(pc.cast(col, pa.string()), "")
            except pa.ArrowNotImplementedError:
                val = pa.array([repr(v) for v in col.to_pylist()],
                               pa.string())
            # null flag keeps None distinct from "" (and any value);
            # the length prefix makes the joined encoding injective
            # even when a value contains the separator byte itself
            flag = pc.if_else(pc.is_null(col),
                              pa.scalar("0", pa.string()),
                              pa.scalar("1", pa.string()))
            parts.append(flag)
            parts.append(pc.cast(pc.utf8_length(val), pa.string()))
            parts.append(val)
        joined = pc.binary_join_element_wise(
            *parts, pa.scalar("\x1f", pa.string()))
        enc = joined.to_numpy(zero_copy_only=False)
        h1 = pd.util.hash_array(enc, hash_key="dedupe-rowhash-1",
                                categorize=False)
        h2 = pd.util.hash_array(enc, hash_key="dedupe-rowhash-2",
                                categorize=False)
        buf = np.empty((len(enc), 2), dtype=">u8")
        buf[:, 0] = h1
        buf[:, 1] = h2
        keys = np.frombuffer(binascii.hexlify(buf.tobytes()),
                             dtype="S32").astype("U32")
        return batch.append_column(out_col, pa.array(keys, pa.string()))
    return ds.map_batches(fn, batch_format="pyarrow")


def partition(records: ray.data.Dataset, model: Model,
              threshold: float = 0.5, *,
              id_col: str = "record_id",
              ckpt_dir: str | None = None,
              max_block_size: int = 500,
              hard_cap: int = 20_000,
              max_sampled_pairs: int = 200_000,
              scorer_concurrency: int | tuple | None = None,
              cc_mode: str = "auto",
              exact_collapse: bool = True,
              num_partitions: int | None = None,
              return_stage: str | None = None,
              pair_distinct: str | None = None,
              metrics: dict | None = None) -> ray.data.Dataset:
    """records → entity map (record_id, cluster_id, confidence).

    Singletons get cluster_id = record_id, confidence 1.0; cluster_id
    is the min record_id of the cluster (deterministic across
    parallelism — SURVEY.md §4.6).

    ``return_stage`` exposes pipeline intermediates for oracle checks
    (same code path as the full run, cut short):
    - "scores": the scored candidate pairs (id_a, id_b, score);
    - "components": the threshold-edge connected-component map for
      EVERY record (record_id, cluster_id = component min record id,
      confidence 1.0) — i.e. the full entity map with the per-component
      hierarchical-clustering cut replaced by the identity.

    ``pair_distinct`` ("exact" | "local" | "auto" | None): how
    candidate pairs are globally deduplicated.  None (default) picks
    "exact" when the pair set itself is the product
    (return_stage="scores" — the reference's SQL DISTINCT contract)
    and "auto" for the entity-map and components paths: the scorer
    tolerates cross-partition duplicates (scores are a pure function
    of the two records), CC is duplicate-invariant, and the clustering
    kernel dedups exactly, so above the measured pair-volume crossover
    (``stages.blocking.LOCAL_DISTINCT_MIN_PAIRS``) the full all-to-all
    distinct sort is skipped (135M pairs at 950k pages: 744s -> 438s),
    while below it the global distinct stays (duplicate scoring work
    costs more than the small sort: 474k pages at 8 CPUs measured
    276s exact vs 370s local, hash-identical both ways).
    """
    if return_stage not in (None, "scores", "components"):
        raise ValueError(f"unknown return_stage: {return_stage!r}")
    if pair_distinct not in (None, "exact", "local", "auto"):
        raise ValueError(f"unknown pair_distinct: {pair_distinct!r}")
    if pair_distinct is None:
        pair_distinct = "exact" if return_stage == "scores" else "auto"
    import os
    import time as _time

    _debug = bool(os.environ.get("DEDUPE_DEBUG_TIMING"))
    _t0 = _time.monotonic()

    def _mark(label: str) -> None:
        if _debug:
            print(f"[partition {_time.monotonic() - _t0:7.1f}s] {label}",
                  flush=True)

    from dedupe_api_ray.utils import default_num_partitions
    num_partitions = default_num_partitions(num_partitions)
    ckpt = CheckpointManager(ckpt_dir)
    model_fp = fingerprint_of(
        [f.__dict__ for f in model.field_defs],
        [p.pred_id for p in model.predicates],
        model.weights.tolist(), model.bias, threshold)

    # Stage fingerprints CHAIN: each folds in its upstream stage's
    # fingerprint plus its own params, and the root folds in an input-
    # dataset identity (source files + row count — a content digest
    # would cost a full read), so changing the input or an upstream
    # knob invalidates every downstream checkpoint.
    if ckpt_dir:
        try:
            in_files = sorted(records.input_files() or [])
        except Exception:  # non-read datasets have no input files
            in_files = []
        input_fp = fingerprint_of(in_files, records.count())
    else:
        input_fp = ""
    records_fp = fingerprint_of(model_fp, "records", input_fp)

    prepared = ckpt.run_stage(
        "records", records_fp,
        lambda: prepare_records(records, model.field_defs, id_col,
                                tokenize=False))

    pschema = prepared.schema()
    if pschema is None or not pschema.names:
        # EMPTY records input: map stages are skipped on empty blocks
        # (Ray 2.49) so the prepared dataset has no schema at all.
        # The entity map is empty by definition — return it typed.
        return ray.data.from_arrow(pa.table({
            "record_id": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64()),
            "confidence": pa.array([], pa.float64())}))

    # Arrow's hash join rejects list<> payload columns: drop any
    # pre-supplied __tokens columns here and re-derive them after the
    # collapse (add_tokens below).
    token_cols = [c for c in (pschema.names or [])
                  if c.endswith("__tokens")]
    if token_cols:
        prepared = prepared.drop_columns(token_cols)

    fuzzy_input = prepared
    dupes_map = None  # row_hash duplicates folded out before matching
    if exact_collapse:
        fields = sorted({f.field for f in model.field_defs
                         if f.type != "Interaction"})
        hashed = add_row_hash(prepared, fields)
        hashed = hashed.materialize()
        _mark("hashed materialized")
        # representative = min record_id per full-128-bit hash (see
        # add_row_hash collision bound)
        from dedupe_api_ray.utils import should_broadcast

        class CollapseAnnotate:
            """Actor-pool annotator: the rep map travels as an Arrow
            table (zero-copy plasma read); lookup is a sorted fixed-
            width-bytes array + np.searchsorted (C memcmp), built ONCE
            per actor — the r3 version probed a Python dict per row
            over the whole corpus (hex keys are fixed 32 chars, so
            '|S32' gives a dense vectorizable key array)."""

            def __init__(self, ref):
                tbl: pa.Table = ray.get(ref)
                keys = np.asarray(tbl["row_hash"].to_pylist(),
                                  dtype="S32")
                order = np.argsort(keys, kind="stable")
                self.keys = keys[order]
                self.reps = tbl["rep_id"].to_numpy(
                    zero_copy_only=False).astype(np.int64)[order]

            def __call__(self, t: pa.Table) -> pa.Table:
                probe = np.asarray(t["row_hash"].to_pylist(), dtype="S32")
                pos = np.searchsorted(self.keys, probe)
                # every row_hash is present by construction
                rid = self.reps[pos]
                return t.append_column("rep_id", pa.array(rid, pa.int64()))

        rep_ref = None
        narrow = None
        rep_tbl = None
        if hashed.count() <= COLLAPSE_DRIVER_MAX:
            # modest corpus: the NARROW (row_hash, id) projection fits
            # the driver (≤ ~200 MB) — one vectorized Arrow group_by
            # there beats a shuffle groupby whose aggregator-actor pool
            # startup alone costs multiple seconds
            nbatches = list(
                hashed.select_columns(["row_hash", id_col])
                .iter_batches(batch_format="pyarrow",
                              batch_size=1 << 20))
            if nbatches:
                narrow = pa.concat_tables(nbatches)
                g = narrow.group_by("row_hash").aggregate(
                    [(id_col, "min")])
                rep_tbl = pa.table({
                    "row_hash": g["row_hash"].combine_chunks(),
                    "rep_id": pc.cast(g[f"{id_col}_min"], pa.int64())})
                rep_ref = ray.put(rep_tbl)
            else:  # typed-empty input: nothing to collapse
                rep_ref = ray.put(pa.table({
                    "row_hash": pa.array([], pa.string()),
                    "rep_id": pa.array([], pa.int64())}))
        else:
            reps = hashed.groupby("row_hash").min(id_col)
            reps = reps.map_batches(
                lambda t: t.rename_columns(["row_hash", "rep_id"]),
                batch_format="pyarrow").materialize()
            if should_broadcast(reps):
                rep_tbl = pa.concat_tables(list(reps.iter_batches(
                    batch_format="pyarrow", batch_size=1 << 20)))
                rep_ref = ray.put(rep_tbl)
        if narrow is not None and rep_tbl is not None:
            # driver fast path: the narrow (row_hash, id) projection is
            # ALREADY on the driver, so dupes_map is one vectorized
            # searchsorted here — and fuzzy_input becomes a single
            # fused annotate+filter pass over `hashed`.  This removes
            # the `joined` materialize (a full-corpus round-trip
            # through plasma) and the separate dup_fn corpus scan:
            # ~7 s of CPU-count-invariant wall at 474k pages.
            keys = np.asarray(narrow["row_hash"].to_pylist(), dtype="S32")
            ids = narrow[id_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64, copy=False)
            rkeys = np.asarray(rep_tbl["row_hash"].to_pylist(), dtype="S32")
            rorder = np.argsort(rkeys, kind="stable")
            reps_sorted = rep_tbl["rep_id"].to_numpy(
                zero_copy_only=False).astype(np.int64)[rorder]
            rep_of = reps_sorted[np.searchsorted(rkeys[rorder], keys)]
            dmask = ids != rep_of
            dupes_map = ray.data.from_arrow(pa.table({
                id_col: pa.array(ids[dmask], pa.int64()),
                "rep_id": pa.array(rep_of[dmask], pa.int64())}))

            class CollapseFuzzy(CollapseAnnotate):
                """Keep only representative rows; drop the hash col."""

                def __call__(self, t: pa.Table) -> pa.Table:
                    probe = np.asarray(t["row_hash"].to_pylist(),
                                       dtype="S32")
                    rid = self.reps[np.searchsorted(self.keys, probe)]
                    keep = t[id_col].to_numpy(
                        zero_copy_only=False) == rid
                    return t.filter(pa.array(keep)) \
                        .drop_columns(["row_hash"])

            from dedupe_api_ray.utils import actor_pool
            fuzzy_input = hashed.map_batches(
                CollapseFuzzy, fn_constructor_kwargs={"ref": rep_ref},
                batch_format="pyarrow", concurrency=actor_pool(),
                num_cpus=1)
            _mark("collapse fused (driver dupes_map)")
            joined = None
        elif rep_ref is not None:
            # annotate map-side (one ray.put, per-actor dict build)
            # instead of shuffling the full text payload through a
            # string-keyed hash join
            from dedupe_api_ray.utils import actor_pool
            joined = hashed.map_batches(
                CollapseAnnotate, fn_constructor_kwargs={"ref": rep_ref},
                batch_format="pyarrow", concurrency=actor_pool(),
                num_cpus=1).materialize()
        else:
            joined = hashed.join(reps, join_type="inner",
                                 num_partitions=num_partitions,
                                 on=("row_hash",))
            # Ray 2.49 joins emit SCHEMA-LESS empty blocks for hash
            # partitions that received no rows (degenerate/skewed key
            # distributions), and map UDFs are SKIPPED on empty blocks,
            # so no map can re-type them — any later join over such a
            # block dies with "No match ... FieldRef".  repartition
            # (coalesce mode: linear block split/merge, NOT an
            # all-to-all) folds the empties into typed blocks.
            joined = joined.repartition(num_partitions).materialize()
        if joined is None:
            jschema_obj = None  # driver fast path set fuzzy_input above
        else:
            _mark("collapse join materialized")
            jschema_obj = joined.schema()
        if joined is not None and (
                jschema_obj is None or not jschema_obj.names):
            # partition() called on an EMPTY records dataset: the
            # materialized join has no schema at all (Ray 2.49).  The
            # entity map is empty by definition — return it typed.
            return ray.data.from_arrow(pa.table({
                "record_id": pa.array([], pa.int64()),
                "cluster_id": pa.array([], pa.int64()),
                "confidence": pa.array([], pa.float64())}))
        if joined is not None:
            jschema: pa.Schema = jschema_obj.base_schema
            dup_schema = pa.schema([jschema.field(id_col),
                                    jschema.field("rep_id")])
            fuzzy_schema = pa.schema([f for f in jschema
                                      if f.name not in ("row_hash",
                                                        "rep_id")])

            def dup_fn(t: pa.Table, _s=dup_schema) -> pa.Table:
                if t.num_columns == 0:  # unreachable post-repartition
                    return _s.empty_table()
                return t.filter(pc.not_equal(t[id_col], t["rep_id"])) \
                    .select([id_col, "rep_id"])

            def fuzzy_fn(t: pa.Table, _s=fuzzy_schema) -> pa.Table:
                if t.num_columns == 0:  # unreachable post-repartition
                    return _s.empty_table()
                return t.filter(pc.equal(t[id_col], t["rep_id"])) \
                    .drop_columns(["row_hash", "rep_id"])

            dupes_map = joined.map_batches(dup_fn, batch_format="pyarrow")
            fuzzy_input = joined.map_batches(fuzzy_fn,
                                             batch_format="pyarrow")

    fuzzy_input = add_tokens(fuzzy_input, model.field_defs)
    fuzzy_input = fuzzy_input.materialize()
    # the pre-collapse hashed corpus copy is dead weight in plasma from
    # here on (~a full corpus of text at web-page sizes); drop the
    # reference so the store evicts it instead of spilling LIVE blocks
    # (at 950k pages the 12 GiB store spilled 8.8 GiB mid-scoring)
    hashed = None  # noqa: F841
    _mark('fuzzy_input ready')

    canopy_specs = [(i, s) for i, s in enumerate(model.predicates)
                    if s.kind == "tfidf_canopy"]

    def build_blocking_map():
        bm = fingerprint_records(fuzzy_input, model)
        for i, spec in canopy_specs:
            from dedupe_api_ray.blocking.canopy import tfidf_canopy_keys
            ck = tfidf_canopy_keys(fuzzy_input, spec.field,
                                   spec.params.get("threshold", 0.4),
                                   id_col=id_col, pred_tag=str(i))
            bm = bm.union(ck)
        return bm

    blocking_fp = fingerprint_of(records_fp, "blocking_map",
                                 exact_collapse)
    blocking_map = ckpt.run_stage("blocking_map", blocking_fp,
                                  build_blocking_map)
    _mark('blocking_map stage defined')

    pairs_fp = fingerprint_of(blocking_fp, "pairs", max_block_size, hard_cap,
                              max_sampled_pairs, pair_distinct)
    scores_fp = fingerprint_of(pairs_fp, "scores")

    # OVERLAP the TF-sidecar build with the candidate-pairs count pass:
    # both consume only the already-materialized fuzzy_input, and each
    # has driver-side barriers (sidecar shard assembly; hot-key count
    # finish) that leave CPUs idle — two concurrent Ray Data executions
    # interleave their tasks and hide each other's gaps (~10 s of the
    # pre-scoring serial chain at 237k pages).  Skipped when the scores
    # stage will checkpoint-resume (the sidecar would be thrown away).
    from dedupe_api_ray.state.checkpoint import CODE_VERSION
    _scores_man = ckpt.load_manifest("scores") if ckpt.root else None
    _scores_cached = bool(
        _scores_man and _scores_man.get("fingerprint") == scores_fp
        and _scores_man.get("code_version") == CODE_VERSION)
    _sidecar_box: dict = {}
    _sc_th = None
    if not _scores_cached:
        import threading

        def _sidecar_bg():
            try:
                from dedupe_api_ray.stages.scoring import build_tf_sidecar
                _sidecar_box["sidecar"] = build_tf_sidecar(fuzzy_input,
                                                           model)
            except BaseException as e:  # re-raised on join in do_score
                _sidecar_box["err"] = e
        _sc_th = threading.Thread(target=_sidecar_bg, daemon=True,
                                  name="tf-sidecar-build")
        _sc_th.start()

    # caller-visible blocking observability (dropped/salted keys)
    pair_metrics: dict = metrics if metrics is not None else {}
    pairs = ckpt.run_stage(
        "pairs", pairs_fp,
        lambda: candidate_pairs(blocking_map, max_block_size=max_block_size,
                                hard_cap=hard_cap, metrics=pair_metrics,
                                max_sampled_pairs=max_sampled_pairs,
                                distinct=pair_distinct),
        metrics=pair_metrics)

    def do_score():
        if _sc_th is not None:
            _sc_th.join()
            if "err" in _sidecar_box:
                raise _sidecar_box["err"]
            sidecar = _sidecar_box["sidecar"]
        else:  # scores checkpoint was expected to resume but didn't
            from dedupe_api_ray.stages.scoring import build_tf_sidecar
            sidecar = build_tf_sidecar(fuzzy_input, model)
        _mark('tf sidecar built')
        # Text fields whose cosine comes from the sidecar ship NO raw
        # column with the pairs (a field also used by a non-Text,
        # non-Interaction def still ships for that kernel).  Without
        # this the payload stage multiplies the corpus text by
        # pairs-per-record through the object store — the dominant
        # partition() cost at web-page sizes.
        sidecar_only = set(sidecar or ()) - {
            f.field for f in model.field_defs
            if f.type not in ("Text", "Interaction")}
        # STREAM the pairs into the scorer (no materialize barrier):
        # the distinct-pairs reduce partitions feed scorer actors as
        # they finish, the scorer pool spins up DURING the pair
        # shuffle, and 40M+ bare pairs skip one full plasma
        # round-trip.  The pool's MINIMUM is sized from the blocking-
        # map row count (recorded by candidate_pairs, ~free) — an
        # autoscaling (1, N) pool otherwise ramps too slowly for a
        # short stage (measured ~7.6x effective parallelism on 32
        # CPUs); a checkpoint-resumed pairs stage is parquet-backed,
        # so its count() is metadata-cheap and used directly.
        n_hint = pair_metrics.get("blocking_rows")
        if n_hint is None:
            try:  # ckpt resume path: read_parquet-backed dataset
                n_hint = pairs.count() if pairs.input_files() else None
            except Exception:
                n_hint = None
        conc = scorer_concurrency
        if conc is None:
            # CPU-scaled autoscaling pool.  NEVER default to a fixed
            # int pool: a fixed pool of idle scorer actors can reserve
            # EVERY cluster CPU and starve the upstream pair shuffle —
            # a hard deadlock on small clusters (hit by the job CLI on
            # a 4-CPU test session before this default changed).
            from dedupe_api_ray.utils import actor_pool
            conc = actor_pool()
        if isinstance(conc, tuple) and conc[0] < conc[1]:
            # floor CAPPED AT HALF the pool max: a full-CPU floor of
            # idle actors holds CPU reservations the distinct-pairs
            # shuffle needs to produce anything at all (measured: the
            # fused stage crawls with floor == max); the autoscaler
            # grows the pool to max as reduce partitions drain.
            lo = max(conc[0], min(max(1, conc[1] // 2),
                                  (n_hint or 0) // 25_000 + 1))
            conc = (lo, conc[1])
        pairs_mat = pairs
        _mark(f'pairs stage defined (streaming; pool floor {conc})')
        # payload routing: small records side → FUSED broadcast (each
        # scorer actor gathers record columns itself — no separate
        # AttachBroadcast pool competing for the same CPUs, no extra
        # pass of every pair's payload through the object store);
        # large side → the two-sided hash join via attach_payload.
        from dedupe_api_ray.stages.scoring import _payload_columns
        from dedupe_api_ray.utils import should_broadcast as _sb
        pay_cols = _payload_columns(model, exclude=sidecar_only)
        if not pay_cols:
            # every feature is sidecar-covered: bare pairs, no payload
            return score_pairs(pairs_mat, model, concurrency=conc,
                               sidecar_refs=sidecar)
        # route on the bytes that actually SHIP: sidecar-covered Text
        # columns never travel, so a corpus whose full record set is
        # over the broadcast bound may still have a tiny (id, short
        # fields) payload — probe the narrow projection before falling
        # back to the join (at ~1M web pages the full set is GiBs but
        # the projection is ~tens of MB; mis-routing to the hash join
        # ships every pair's payload through an extra shuffle).
        sel = None
        if _sb(fuzzy_input):
            sel = fuzzy_input.select_columns([id_col, *pay_cols])
        elif fuzzy_input.count() <= 2_000_000:
            probe = fuzzy_input.select_columns([id_col, *pay_cols]) \
                .materialize()
            if _sb(probe):
                sel = probe
        if sel is not None:
            if id_col != "record_id":
                sel = sel.rename_columns({id_col: "record_id"})
            pay_tbl = pa.concat_tables(list(sel.iter_batches(
                batch_format="pyarrow", batch_size=65536)))
            return score_pairs(pairs_mat, model, concurrency=conc,
                               sidecar_refs=sidecar,
                               payload_ref=ray.put(pay_tbl),
                               payload_cols=pay_cols)
        with_payload = attach_payload(pairs_mat, fuzzy_input, model,
                                      num_partitions=num_partitions,
                                      exclude_fields=sidecar_only)
        return score_pairs(with_payload, model,
                           concurrency=conc,
                           sidecar_refs=sidecar)

    scored = ckpt.run_stage("scores", scores_fp, do_score)
    _mark('scores stage defined')

    if return_stage == "scores":
        return scored.map_batches(
            lambda t: t.select(["id_a", "id_b", "score"]),
            batch_format="pyarrow")

    if return_stage == "components":
        # same edges as cluster_scored_pairs, but labels pass through
        # as cluster assignments (no hclust cut) — confidence 1.0
        from dedupe_api_ray.stages.clustering import connected_components
        kept = scored.map_batches(
            lambda t: t.filter(pc.greater_equal(t["score"], threshold)),
            batch_format="pyarrow").materialize()
        if kept.count() == 0:
            clustered = ray.data.from_arrow(pa.table({
                "record_id": pa.array([], pa.int64()),
                "cluster_id": pa.array([], pa.int64()),
                "confidence": pa.array([], pa.float64())}))
        else:
            edges = kept.map_batches(
                lambda t: pa.table({"u": t["id_a"], "v": t["id_b"]}),
                batch_format="pyarrow")
            clustered = connected_components(edges, mode=cc_mode,
                                             n_edges=kept.count()) \
                .map_batches(
                    lambda t: pa.table({
                        "record_id": t["record_id"],
                        "cluster_id": t["component_id"],
                        "confidence": pa.array(
                            np.ones(len(t)), pa.float64())}),
                    batch_format="pyarrow")
    else:
        clustered = cluster_scored_pairs(scored, threshold=threshold,
                                         cc_mode=cc_mode)
    clustered = clustered.materialize()
    _mark('clustered materialized')

    # singletons: records with no above-threshold edge.  These joins
    # run over row counts ~= the record count, so size their partition
    # count by DATA, not CPUs — join aggregator-actor startup dominates
    # small joins otherwise; small sides broadcast instead of joining.
    from dedupe_api_ray.utils import should_broadcast
    n_fuzzy = fuzzy_input.count()
    np_small = max(2, min(num_partitions, n_fuzzy // 100_000 + 2))
    all_ids = fuzzy_input.select_columns([id_col])
    if clustered.count() == 0:
        # no above-threshold edges at all: everyone is a singleton
        # (empty right sides lose their schema in Ray 2.49 joins)
        entity_map = all_ids.map_batches(
            lambda t: pa.table({
                "record_id": t[id_col], "cluster_id": t[id_col],
                "confidence": pa.array(np.ones(len(t)), pa.float64())}),
            batch_format="pyarrow").materialize()
    elif should_broadcast(clustered):
        # small cluster map: broadcast + searchsorted annotate, no
        # left-outer join (which spawns an aggregator pool and can emit
        # schema-less empty partitions — see the collapse-join note)
        ctbl = pa.concat_tables(list(clustered.iter_batches(
            batch_format="pyarrow", batch_size=1 << 20)))
        cr = ctbl["record_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(cr, kind="stable")
        clu_ref = ray.put((cr[order],
                           ctbl["cluster_id"].to_numpy(
                               zero_copy_only=False)[order],
                           ctbl["confidence"].to_numpy(
                               zero_copy_only=False)[order]))

        def fill_bcast(batch: pa.Table) -> pa.Table:
            r, c, f = ray.get(clu_ref)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(r, ids), len(r) - 1)
            hit = r[pos] == ids
            cid = np.where(hit, c[pos], ids)
            conf = np.where(hit, f[pos], 1.0)
            return pa.table({
                "record_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(cid, pa.int64()),
                "confidence": pa.array(conf, pa.float64())})

        entity_map = all_ids.map_batches(
            fill_bcast, batch_format="pyarrow").materialize()
    else:
        assigned = clustered.map_batches(
            lambda t: t.rename_columns(["__rid", "cluster_id", "confidence"]),
            batch_format="pyarrow")
        left = all_ids.join(assigned, join_type="left_outer",
                            num_partitions=np_small,
                            on=(id_col,), right_on=("__rid",))

        def fill_singletons(batch: pa.Table) -> pa.Table:
            rid = batch[id_col]
            cid = pc.coalesce(batch["cluster_id"], rid)
            conf = pc.coalesce(batch["confidence"],
                               pa.scalar(1.0, pa.float64()))
            return pa.table({"record_id": rid, "cluster_id": cid,
                             "confidence": conf})

        # materialize: the dup-rejoin branch consumes entity_map twice
        # (union side + rep lookup side); lazy it would execute the
        # left-outer join twice.  repartition first: the left-outer
        # join can emit schema-less empty partitions on degenerate key
        # distributions (see the collapse-join note above).
        entity_map = left.repartition(np_small) \
            .map_batches(fill_singletons, batch_format="pyarrow") \
            .materialize()
    _mark("entity_map (pre-dup) materialized")

    if entity_map.count() == 0:
        # fully-empty run whose emptiness escaped the earlier guards
        # (schema() is inference-based and can report upstream column
        # names even for schema-less materialized data — Ray 2.49):
        # count() on the materialized map is definitive.  Return typed.
        return ray.data.from_arrow(pa.table({
            "record_id": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64()),
            "confidence": pa.array([], pa.float64())}))

    if exact_collapse and dupes_map is not None and dupes_map.count() > 0:
        # duplicates rejoin with their representative's cluster (M5 †);
        # confidence 1.0 (byte-identical content).  Size-routed like
        # the other small-side lookups.
        if should_broadcast(entity_map):
            etbl = pa.concat_tables(list(entity_map.iter_batches(
                batch_format="pyarrow", batch_size=1 << 20)))
            er = etbl["record_id"].to_numpy(zero_copy_only=False)
            order = np.argsort(er, kind="stable")
            em_ref = ray.put((er[order],
                              etbl["cluster_id"].to_numpy(
                                  zero_copy_only=False)[order]))

            def dup_lookup(t: pa.Table) -> pa.Table:
                r, c = ray.get(em_ref)
                reps_ids = t["rep_id"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(r, reps_ids)  # every rep is mapped
                return pa.table({
                    "record_id": t[id_col],
                    "cluster_id": pa.array(c[pos], pa.int64()),
                    "confidence": pa.array(np.ones(len(t)), pa.float64())})

            dup_rows = dupes_map.map_batches(dup_lookup,
                                             batch_format="pyarrow")
        else:
            rep_assign = entity_map.map_batches(
                lambda t: t.rename_columns(
                    ["rep_id", "cluster_id", "confidence"]),
                batch_format="pyarrow")
            dup_rows = dupes_map.join(rep_assign, join_type="inner",
                                      num_partitions=np_small,
                                      on=("rep_id",))
            dup_rows = dup_rows.map_batches(
                lambda t: pa.table({
                    "record_id": t[id_col],
                    "cluster_id": t["cluster_id"],
                    "confidence": pa.array(np.ones(len(t)), pa.float64()),
                }), batch_format="pyarrow")
        entity_map = entity_map.union(dup_rows)

    if ckpt_dir:
        entity_map = ckpt.run_stage(
            "entity_map",
            fingerprint_of(scores_fp, "entity_map", cc_mode),
            lambda: entity_map)
    return entity_map


def dedupe_canon(records: ray.data.Dataset, model: Model,
                 threshold: float = 0.5, *,
                 id_col: str = "record_id",
                 **partition_kwargs) -> tuple[ray.data.Dataset,
                                              ray.data.Dataset]:
    """E1 tail (dedupe-api:api/utils/delayed_tasks.py::dedupeCanon †):
    first partition, then canonicalize each cluster to a single
    representative record, re-run block/score/cluster on the canonical
    records, and compose the two entity maps (a record's final cluster
    is its canon rep's second-round cluster).

    Returns (final_entity_map, canon_records)."""
    from dedupe_api_ray.stages.canonicalize import canonicalize
    from dedupe_api_ray.utils import default_num_partitions

    num_partitions = default_num_partitions(
        partition_kwargs.get("num_partitions"))
    em1 = partition(records, model, threshold, id_col=id_col,
                    **partition_kwargs).materialize()
    fields = [f.field for f in model.field_defs if f.type != "Interaction"]
    canon = canonicalize(em1, records, fields).materialize()
    canon_records = canon.map_batches(
        lambda t: t.drop_columns(["n_members"])
        .rename_columns(["record_id", *fields]),
        batch_format="pyarrow")
    em2 = partition(canon_records, model, threshold,
                    **partition_kwargs).materialize()
    # compose: record → cluster1 (canon rep id) → cluster2
    em2_renamed = em2.map_batches(
        lambda t: pa.table({"cluster_id": t["record_id"],
                            "final_cluster_id": t["cluster_id"]}),
        batch_format="pyarrow")
    final = em1.join(em2_renamed, join_type="inner",
                     num_partitions=num_partitions, on=("cluster_id",))
    final = final.map_batches(
        lambda t: pa.table({"record_id": t["record_id"],
                            "cluster_id": t["final_cluster_id"],
                            "confidence": t["confidence"]}),
        batch_format="pyarrow")
    return final, canon_records
