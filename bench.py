"""Benchmark harness (driver-run per round; BASELINE.md protocol).

Headline pipelines, timed separately and summed into one metric:
- ingest:          read synthetic pages parquet → HTML→text extract →
                   normalize → tokenize → write parquet (M1/M2)
- partition:       full flagship dedupe (block → salted pairs → scorer
                   actor pool → CC → per-component clustering) on the
                   same corpus
- minhash_dedup:   MinHash+LSH near-dup candidate generation over the
                   corpus texts
- q1_lineitem:     generic vectorized aggregate over $GRAFT_SF_DIR
                   lineitem (engine-op conformance at sf scale)
- quantiles:       exact selection quantiles over lineitem price
                   (histogram-refine passes, no sort shuffle)
- multimodal:      decode + featurize a deterministic synthetic media
                   table (real PPM/BMP/WAV bytes, actor-pool stage,
                   checksummed descriptors)

Prints ONE JSON line:
  {"metric": "e2e_bench_sec", "value": <sum>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "rows": {...},
   "entity_map_hash": "..."}

--scaling: runs the same bench in two fresh subprocesses with
RAY_GRAFT_CPUS=8 and 32, reports both + efficiency
(t8/t32)/4 and checks the entity maps are identical (determinism
across parallelism, SURVEY.md §4.6/§5.4).

This script OWNS its Ray session (the driver contract applies only to
__ray_entry__).
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

BENCH_ENTITIES = int(os.environ.get("BENCH_ENTITIES", "25000"))
CORPUS_DIR = f"/tmp/dedupe_bench_corpus_{BENCH_ENTITIES}"
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def ensure_corpus() -> str:
    """Deterministic synthetic pages corpus (seed=42), cached in /tmp
    so both scaling runs see identical input."""
    import pyarrow.parquet as pq

    path = f"{CORPUS_DIR}/pages.parquet"
    if os.path.exists(path):
        return path
    from dedupe_api_ray.fixtures import make_pages_corpus

    os.makedirs(CORPUS_DIR, exist_ok=True)
    data = make_pages_corpus(n_entities=BENCH_ENTITIES, seed=42)
    pq.write_table(data["pages"], path + ".tmp")
    os.rename(path + ".tmp", path)
    pq.write_table(data["labeled_pairs"], f"{CORPUS_DIR}/labeled_pairs.parquet")
    pq.write_table(data["gold_clusters"], f"{CORPUS_DIR}/gold_clusters.parquet")
    return path


def ensure_media_corpus() -> str:
    """Deterministic synthetic media table (real PPM/BMP image bytes +
    PCM WAV audio bytes — the clean-room containers multimodal.py
    decodes), cached in /tmp.  Binary payloads are the point: the leg
    exercises the opaque-binary-column schema, the small-batch
    actor-pool decode, and the fixed-width descriptor output at bench
    scale, not 24-row test scale."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = int(os.environ.get("BENCH_MEDIA_ROWS", "40000"))
    path = f"/tmp/dedupe_bench_media_{n}"
    done = f"{path}/media.parquet"
    if os.path.exists(done):
        return done
    from dedupe_api_ray.extras.multimodal import (encode_bmp, encode_ppm,
                                                  encode_wav)
    rng = np.random.RandomState(7)
    os.makedirs(path, exist_ok=True)
    ids, types, payloads, w, h, sr, nb = [], [], [], [], [], [], []
    for i in range(n):
        kind = ("image/x-portable-pixmap", "image/bmp", "audio/wav")[i % 3]
        if kind.startswith("image"):
            hh, ww = int(rng.randint(24, 64)), int(rng.randint(24, 64))
            img = rng.randint(0, 256, size=(hh, ww, 3)).astype(np.uint8)
            payload = encode_ppm(img) if kind.endswith("pixmap") \
                else encode_bmp(img)
            w.append(ww); h.append(hh); sr.append(-1)
        else:
            rate = 8000
            t = np.arange(int(rng.randint(800, 4000))) / rate
            freq = float(rng.randint(100, 1500))
            payload = encode_wav(0.5 * np.sin(2 * np.pi * freq * t), rate)
            w.append(-1); h.append(-1); sr.append(rate)
        ids.append(i); types.append(kind)
        payloads.append(payload); nb.append(len(payload))
    t = pa.table({"media_id": pa.array(ids, pa.int64()),
                  "media_type": pa.array(types, pa.string()),
                  "payload": pa.array(payloads, pa.binary()),
                  "width": pa.array(w, pa.int32()),
                  "height": pa.array(h, pa.int32()),
                  "sample_rate": pa.array(sr, pa.int32()),
                  "n_bytes": pa.array(nb, pa.int64())})
    pq.write_table(t, done + ".tmp")
    os.rename(done + ".tmp", done)
    return done


def bench_model():
    """Trained weights (tiny fixture) + pinned blocking predicates so
    the bench workload is stable across rounds.

    The training run is deterministic (fixed fixture + seed), so the
    frozen model is CACHED on disk keyed by the source files that
    determine it — retraining inside every bench leg was ~4 s of
    parallelism-independent wall that the scaling protocol pays twice.
    """
    import pickle

    from dedupe_api_ray.fixtures import make_pages_corpus, record_id_of_url
    from dedupe_api_ray.model import FieldDef, PredicateSpec, train_model

    here = os.path.dirname(os.path.abspath(__file__))
    key = hashlib.blake2b(digest_size=8)
    # bench.py itself is in the key: the pinned predicate list and the
    # tiny-fixture training parameters live HERE, so editing them must
    # invalidate the cached model
    for src in ("bench.py", "dedupe_api_ray/fixtures.py",
                "dedupe_api_ray/model.py",
                "dedupe_api_ray/functions/text.py"):
        with open(os.path.join(here, src), "rb") as f:
            key.update(f.read())
    cache = f"/tmp/dedupe_bench_model_{key.hexdigest()}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)

    fields = [FieldDef("text", "Text"), FieldDef("url_host", "ShortString")]
    tiny = make_pages_corpus(n_entities=200, seed=42)
    cols = tiny["pages"].to_pydict()
    recs = {record_id_of_url(u): {"text": t, "url_host": u.split("/")[2]}
            for u, t in zip(cols["url"], cols["text"])}
    lp = tiny["labeled_pairs"].to_pydict()
    labeled = list(zip(lp["id_a"], lp["id_b"], lp["label"]))
    model = train_model(recs, labeled, fields, max_predicates=3)
    model.predicates = [
        PredicateSpec("compound", "text",
                      parts=(("commonIntegerPredicate", "text"),
                             ("wholeFieldPredicate", "url_host"))),
        PredicateSpec("simple", "url_host", "wholeFieldPredicate"),
        PredicateSpec("simple", "text", "fingerprint"),
    ]
    with open(cache + ".tmp", "wb") as f:
        pickle.dump(model, f)
    os.rename(cache + ".tmp", cache)
    return model


def _quiet_ray_data_logging() -> None:
    """Route ray.data's 'Failed to hash the schemas' warning (emitted
    in READ WORKERS whenever a parquet file carries pandas schema
    metadata — the testdata files do) to the session log file only.
    Worker loggers are configured from RAY_DATA_LOGGING_CONFIG, so a
    driver-side logging filter cannot reach them; this env var is
    inherited by the raylet's workers."""
    import yaml
    from ray.data._internal.logging import DEFAULT_CONFIG

    cfg = dict(DEFAULT_CONFIG)
    cfg["loggers"] = dict(cfg["loggers"])
    cfg["loggers"]["ray.data._internal.arrow_ops.transform_pyarrow"] = {
        "level": "ERROR", "handlers": ["file"], "propagate": False}
    path = "/tmp/ray_data_logging_bench.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    os.environ["RAY_DATA_LOGGING_CONFIG"] = path


def run_bench() -> dict:
    import pyarrow as pa
    import ray
    import ray.data
    from ray.data import DataContext

    _quiet_ray_data_logging()
    # cap the object store: the default 37.5 GiB /dev/shm reservation
    # plus 100+ worker heaps at num_cpus=32 pushed the node into
    # OOM-killed workers (round 2).  24 GiB (was 12) after the round-4
    # 950k-page run spilled 8.8 GiB through the 12 GiB store while the
    # box sat at 60 GB free — worker heaps are lean now, and spill I/O
    # (~100 MiB/s here) was the dominant wall at that size.
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR",
             object_store_memory=24 * 1024 ** 3)
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    # Ray 2.49's Aggregate operator emits schema-less EMPTY bundles for
    # reduce partitions that received no groups — even at
    # num_partitions=1 on a 2-group input (verified: a minimal
    # groupby().aggregate() reproduces it) — and the executor then
    # warns "RefBundle with a different schema".  Harmless and not
    # addressable from user code, so drop exactly that message.
    import logging

    class _DropRefBundleSchemaWarning(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return ("RefBundle with a different schema"
                    not in record.getMessage())

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_DropRefBundleSchemaWarning())

    pages_path = ensure_corpus()
    queries: dict[str, float] = {}
    rows: dict[str, int] = {}

    # warm the page cache so both levels measure compute, not first read
    with open(pages_path, "rb") as f:
        while f.read(1 << 24):
            pass

    # ---- ingest ----------------------------------------------------------
    from dedupe_api_ray.fixtures import record_id_of_url
    from dedupe_api_ray.functions.text import (extract_text_batch,
                                               normalize_array,
                                               tokenize_array)

    def ingest_batch(t: pa.Table) -> pa.Table:
        t = extract_text_batch(t, "html", "text_extracted")
        urls = t["url"].to_pylist()
        rids = pa.array([record_id_of_url(u) for u in urls], pa.int64())
        hosts = pa.array([u.split("/")[2] for u in urls], pa.string())
        norm = normalize_array(t["text_extracted"])
        toks = tokenize_array(norm)
        return pa.table({"record_id": rids, "url": t["url"],
                         "url_host": hosts, "text": norm,
                         "text__tokens": toks, "lang": t["lang"],
                         "warc_ts": t["warc_ts"]})

    t0 = time.monotonic()
    ingested = ray.data.read_parquet(
            pages_path, override_num_blocks=NUM_CPUS * 3) \
        .map_batches(ingest_batch, batch_format="pyarrow", batch_size=2048)
    out_dir = f"/tmp/bench_out_{NUM_CPUS}/records"
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    ingested.write_parquet(out_dir)
    queries["ingest"] = round(time.monotonic() - t0, 2)
    records = ray.data.read_parquet(out_dir)
    rows["ingest"] = records.count()

    # ---- flagship partition ---------------------------------------------
    from dedupe_api_ray.pipelines.dedupe import partition

    model = bench_model()
    t0 = time.monotonic()
    part_metrics: dict = {}
    em = partition(
        records.drop_columns(["url", "lang", "warc_ts"]),
        model, threshold=0.5,
        max_block_size=200, hard_cap=2000,
        scorer_concurrency=(1, NUM_CPUS), exact_collapse=True,
        metrics=part_metrics)
    em_df = em.to_pandas()
    queries["partition"] = round(time.monotonic() - t0, 2)
    rows["partition"] = len(em_df)
    em_df = em_df.sort_values(["record_id", "cluster_id"]).reset_index(drop=True)
    em_hash = hashlib.md5(
        "\n".join(f"{r}|{c}" for r, c in
                  zip(em_df["record_id"], em_df["cluster_id"])).encode()
    ).hexdigest()

    # ---- minhash near-dup candidates ------------------------------------
    from dedupe_api_ray.extras.dedup import lsh_candidate_pairs, minhash_band_rows

    t0 = time.monotonic()
    mh_metrics: dict = {}
    band_rows = minhash_band_rows(
        records.select_columns(["record_id", "text"]),
        num_perm=32, bands=8, text_col="text", id_col="record_id",
        concurrency=(1, NUM_CPUS))
    cands = lsh_candidate_pairs(band_rows, metrics=mh_metrics)
    rows["minhash_dedup"] = cands.count()
    queries["minhash_dedup"] = round(time.monotonic() - t0, 2)

    # ---- generic aggregate at sf scale ----------------------------------
    import __ray_entry__ as entrymod

    t0 = time.monotonic()
    q1 = entrymod._q_q1_lineitem(SF_DIR).to_pandas()
    queries["q1_lineitem"] = round(time.monotonic() - t0, 2)
    rows["q1_lineitem"] = len(q1)

    # ---- selection quantiles at sf scale (no sort shuffle) ---------------
    t0 = time.monotonic()
    qt = entrymod._q_lineitem_quantiles(SF_DIR)
    queries["quantiles"] = round(time.monotonic() - t0, 2)
    rows["quantiles"] = qt.num_rows

    # ---- multimodal decode/featurize (real PPM/BMP/WAV parsers) ----------
    from dedupe_api_ray.extras.multimodal import extract_media_features

    media_path = ensure_media_corpus()
    t0 = time.monotonic()
    media = ray.data.read_parquet(media_path)
    feats = extract_media_features(media, fake=False, batch_size=256,
                                   concurrency=(1, NUM_CPUS))
    # consume with a deterministic checksum over the descriptors so
    # the leg has a correctness anchor (stable across parallelism)
    import numpy as np
    acc = np.zeros(2, np.float64)
    for b in feats.iter_batches(batch_format="pyarrow", batch_size=4096):
        col = b["feature"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        v = arr.flatten().to_numpy(zero_copy_only=False)
        acc[0] += v.sum()
        acc[1] += len(v)
    queries["multimodal"] = round(time.monotonic() - t0, 2)
    rows["multimodal"] = int(acc[1])
    media_checksum = round(float(acc[0]), 6)

    ray.shutdown()
    total = round(sum(queries.values()), 2)
    return {"metric": "e2e_bench_sec", "value": total, "unit": "sec",
            "queries": queries, "rows": rows,
            "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
            "num_cpus": NUM_CPUS, "bench_entities": BENCH_ENTITIES,
            "blocking_metrics": {
                "partition": part_metrics, "minhash": mh_metrics},
            "media_feature_checksum": media_checksum,
            "entity_map_hash": em_hash}


def run_scaling() -> None:
    def run(ncpu: int, attempts: int = 2) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        for attempt in range(attempts):
            out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                 env=env, capture_output=True, text=True,
                                 cwd=os.path.dirname(os.path.abspath(__file__)))
            if out.returncode == 0:
                return json.loads(out.stdout.strip().splitlines()[-1])
            # a leg occasionally dies on a Ray-internal fatal
            # (task_manager.cc "unexpected system state"); each leg is
            # its own subprocess, so one retry is safe and keeps an
            # unattended paired run alive
            sys.stderr.write(f"--- bench leg num_cpus={ncpu} failed "
                             f"(rc={out.returncode}, attempt {attempt + 1}/"
                             f"{attempts}); stderr tail ---\n")
            sys.stderr.write("\n".join(out.stderr.splitlines()[-40:]) + "\n")
        raise SystemExit(1)

    ensure_corpus()  # generate once, outside both timed runs
    bench_model()    # train + cache once, outside both timed runs
    # N -> 4N pair for the protocol.  Default 4 -> 16, NOT 8 -> 32:
    # tools/cpu_calibrate.py measured this box executing 32 concurrent
    # pure-CPU processes only ~2.6x faster than 8 (16 physical cores +
    # SMT), capping (t8/t32)/4 at ~0.65 for ANY workload — the 8->32
    # pair measures the hypervisor, not the engine.  4 and 16 both fit
    # physical cores, so a perfectly parallel job CAN reach 1.0.
    # Override with BENCH_SCALE_CPUS_LO / BENCH_SCALE_CPUS_HI.
    lo = int(os.environ.get("BENCH_SCALE_CPUS_LO", "4"))
    hi = int(os.environ.get("BENCH_SCALE_CPUS_HI", "16"))

    # bracket each leg with a same-minute hardware sample (ALU burn +
    # streaming-memory burn at exactly lo and hi proc counts) so the
    # efficiency is read against the ceiling the box delivered DURING
    # this run, not a calibration from another day — this sandbox's
    # capacity swings with unobservable hypervisor load (BASELINE.md).
    # BENCH_PAIRED_CAL=0 skips (~30 s per sample).
    cals: list[dict] = []

    def cal() -> None:
        if os.environ.get("BENCH_PAIRED_CAL", "1") != "1":
            return
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        from cpu_calibrate import paired_sample
        cals.append(paired_sample(lo, hi))

    cal()
    r_lo = run(lo)
    cal()
    r_hi = run(hi)
    cal()
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    result = {
        "metric": "scaling_efficiency",
        f"sec_{lo}": r_lo["value"], f"sec_{hi}": r_hi["value"],
        f"queries_{lo}": r_lo["queries"], f"queries_{hi}": r_hi["queries"],
        "scaling_efficiency": round(eff, 3),
        "deterministic_across_parallelism":
            r_lo["entity_map_hash"] == r_hi["entity_map_hash"],
        "entity_map_hash": r_hi["entity_map_hash"],
    }
    if cals:
        key = f"max_eff_{lo}_to_{hi}"
        alu = [c["alu"][key] for c in cals]
        mem = [c["membw"][key] for c in cals]
        result["calibration_samples"] = cals
        result["hw_ceiling_alu"] = round(sum(alu) / len(alu), 3)
        result["hw_ceiling_membw"] = round(sum(mem) / len(mem), 3)
        # a shuffle-dominated engine leg cannot beat the membw ceiling;
        # this ratio is the protocol's "engine vs simultaneous
        # hardware" reading (VERDICT r4 item 4)
        result["efficiency_vs_membw_ceiling"] = round(
            eff / result["hw_ceiling_membw"], 3)
        result["efficiency_vs_alu_ceiling"] = round(
            eff / result["hw_ceiling_alu"], 3)
    print(json.dumps(result))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
