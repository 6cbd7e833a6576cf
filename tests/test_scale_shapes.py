"""Scale-shape regression tests (round-2 fixes):

- hot LSH band buckets (>5000 members) are salted losslessly, never
  silently dropped;
- the near-dup verify join path produces byte-identical results to the
  broadcast path;
- hard_cap drops are observable via the metrics sidecar;
- latLongGridPredicate (P17) through the registry / fingerprinter;
- IVF centroid training samples randomly (sorted input no longer
  biases the sample to the first rows).
"""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data


def test_lsh_hot_bucket_salted_lossless(ray_session):
    """A band bucket with >5000 members must yield ALL C(n,2) pairs
    (round-1 silently dropped such buckets)."""
    from dedupe_api_ray.extras.dedup import lsh_candidate_pairs

    n = 5100
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "band_key": pa.array(np.full(n, 7, dtype=np.int64)),
    })
    metrics = {}
    pairs = lsh_candidate_pairs(ray.data.from_arrow(tbl), metrics=metrics)
    assert pairs.count() == n * (n - 1) // 2
    assert metrics["dropped_keys"] == 0
    assert metrics["salted_keys"] == 1


def test_candidate_pairs_hard_cap_metrics(ray_session):
    """hard_cap handling must surface in the metrics dict (never
    silent).  Since r4 the default mode SAMPLES over-cap keys instead
    of dropping them; the drop path stays available explicitly."""
    from dedupe_api_ray.stages.blocking import candidate_pairs

    bm = pa.table({
        "block_key": pa.array(["hot"] * 50 + ["ok"] * 3),
        "record_id": pa.array(np.arange(53, dtype=np.int64)),
    })
    metrics = {}
    pairs = candidate_pairs(ray.data.from_arrow(bm), max_block_size=10,
                            hard_cap=20, hard_cap_mode="drop",
                            metrics=metrics)
    assert pairs.count() == 3  # only the 'ok' block's C(3,2)
    assert metrics["dropped_keys"] == 1
    assert metrics["dropped_rows"] == 50
    assert metrics["est_pair_recall"] == 0.0
    # default (sample): partial hot-key coverage + recall estimate
    m2 = {}
    sampled = candidate_pairs(ray.data.from_arrow(bm), max_block_size=10,
                              hard_cap=20, metrics=m2)
    assert 3 < sampled.count() < 50 * 49 / 2
    assert m2["sampled_keys"] == 1 and 0 < m2["est_pair_recall"] < 1


def test_near_dup_join_path_equals_broadcast(ray_session, tiny_corpus):
    """broadcast_threshold=0 forces the two-join payload path; results
    (incl. rounded jaccard) must match the broadcast path exactly."""
    from dedupe_api_ray.extras.dedup import near_dup_pairs_minhash
    from dedupe_api_ray.fixtures import record_id_of_url

    cols = tiny_corpus["pages"].to_pydict()
    tbl = pa.table({
        "doc_id": pa.array([record_id_of_url(u) for u in cols["url"]],
                           pa.int64()),
        "text": pa.array(cols["text"], pa.string()),
    })
    ds = ray.data.from_arrow(tbl).materialize()

    def run(bt):
        df = near_dup_pairs_minhash(ds, threshold=0.5, num_perm=32,
                                    bands=16,
                                    broadcast_threshold=bt).to_pandas()
        return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    broadcast = run(10**9)
    joined = run(0)
    assert broadcast.equals(joined)
    assert len(broadcast) > 0


def test_latlong_grid_predicate_registry(ray_session):
    """P17: 0.1-degree grid keys; registry + fingerprinter path."""
    from dedupe_api_ray.blocking.predicates import (SIMPLE_PREDICATES,
                                                    lat_long_grid)
    from dedupe_api_ray.model import (FieldDef, Model, PredicateSpec,
                                      _record_keys)
    from dedupe_api_ray.stages.blocking import fingerprint_records

    assert "latLongGridPredicate" in SIMPLE_PREDICATES
    assert lat_long_grid([41.88, -87.63]) == ("418|-877",)
    assert lat_long_grid([-0.05, 0.04]) == ("-1|0",)
    assert lat_long_grid([None, 10.0]) == ()
    assert lat_long_grid([0.0, 0.0]) == ()  # reference's any(field) guard
    assert lat_long_grid(None) == ()

    spec = PredicateSpec("simple", "loc", "latLongGridPredicate")
    assert _record_keys(spec, {"loc": [41.88, -87.63]}) == {"418|-877"}

    model = Model(field_defs=[FieldDef("loc", "LatLong")],
                  predicates=[spec], weights=np.array([1.0]), bias=0.0)
    recs = pa.table({
        "record_id": pa.array([1, 2, 3], pa.int64()),
        "loc": pa.array([[41.88, -87.63], [41.89, -87.61], [10.0, 10.0]],
                        pa.list_(pa.float64())),
    })
    bm = fingerprint_records(ray.data.from_arrow(recs), model).to_pandas()
    by_key = bm.groupby("block_key")["record_id"].apply(set).to_dict()
    assert by_key["0:418|-877"] == {1, 2}  # same 0.1-degree cell
    assert by_key["0:100|100"] == {3}


def test_sharded_canopy_at_10x_no_driver_collection(ray_session, tiny_corpus):
    """mode='sharded' canopy over a 10x corpus: every record gets
    exactly one canopy key, identical texts always share a canopy
    (local centers with cosine 1.0 merge in the center sweep), and the
    member→center similarity invariant holds within each shard."""
    from dedupe_api_ray.blocking.canopy import tfidf_canopy_keys
    from dedupe_api_ray.fixtures import record_id_of_url

    cols = tiny_corpus["pages"].to_pydict()
    base_ids = [record_id_of_url(u) for u in cols["url"]]
    n = len(base_ids)
    rids, texts = [], []
    for rep in range(10):
        for i in range(n):
            rids.append(rep * 10_000_000 + base_ids[i])
            texts.append(cols["text"][i])
    tbl = pa.table({"record_id": pa.array(rids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(tbl).materialize()
    out = tfidf_canopy_keys(ds, "text", threshold=0.5, pred_tag="c",
                            mode="sharded", num_shards=4).to_pandas()
    assert len(out) == len(rids)
    assert out["record_id"].is_unique
    # identical text ⇒ same canopy key
    text_of = dict(zip(rids, texts))
    key_of = dict(zip(out["record_id"], out["block_key"]))
    by_text = {}
    for rid in rids:
        by_text.setdefault(text_of[rid], set()).add(key_of[rid])
    assert all(len(ks) == 1 for ks in by_text.values())


def test_levenshtein_canopy_distinct_value_equivalence(ray_session):
    """The distinct-value sweep must equal the record-level sweep
    (duplicated values, interleaved rids)."""
    from dedupe_api_ray.blocking.levenshtein import (BKTree,
                                                     levenshtein_canopy_keys)

    vals = ["abc", "abd", "xyz", "abc", "xyy", "abd", "qqq", "xyz"]
    rids = [5, 2, 3, 9, 1, 7, 4, 6]
    tbl = pa.table({"record_id": pa.array(rids, pa.int64()),
                    "name": pa.array(vals, pa.string())})
    got_df = levenshtein_canopy_keys(
        ray.data.from_arrow(tbl), "name", distance=1).to_pandas()
    got = {r: k for r, k in zip(got_df["record_id"], got_df["block_key"])}

    # reference record-level sweep (round-1 algorithm)
    rows = sorted(zip(rids, vals))
    tree = BKTree()
    for rid, v in rows:
        tree.add(v, rid)
    assigned = {}
    for rid, v in rows:
        if rid in assigned:
            continue
        assigned[rid] = rid
        for other in tree.search(v, 1):
            if other not in assigned:
                assigned[other] = rid
    want = {r: f"lev:{c}" for r, c in assigned.items()}
    assert got == want


def test_checkpoint_fingerprints_chain(ray_session, tiny_corpus, tmp_path):
    """Changing an upstream knob (max_block_size) must invalidate the
    downstream 'scores' checkpoint — round-1 reused it silently."""
    import json
    import os

    import pyarrow as pa

    from dedupe_api_ray.fixtures import record_id_of_url
    from dedupe_api_ray.model import FieldDef, train_model
    from dedupe_api_ray.pipelines.dedupe import partition

    cols = tiny_corpus["pages"].to_pydict()
    records = {record_id_of_url(u): {"text": t, "url_host": u.split("/")[2]}
               for u, t in zip(cols["url"], cols["text"])}
    lp = tiny_corpus["labeled_pairs"].to_pydict()
    labeled = list(zip(lp["id_a"], lp["id_b"], lp["label"]))
    model = train_model(records, labeled,
                        [FieldDef("text", "Text"),
                         FieldDef("url_host", "ShortString")],
                        max_predicates=3)
    tbl = pa.table({
        "record_id": pa.array(sorted(records), pa.int64()),
        "text": pa.array([records[r]["text"] for r in sorted(records)]),
        "url_host": pa.array([records[r]["url_host"]
                              for r in sorted(records)]),
    })
    ck = str(tmp_path / "ck")

    def scores_fp(max_block_size):
        partition(ray.data.from_arrow(tbl), model, threshold=0.5,
                  ckpt_dir=ck, max_block_size=max_block_size,
                  scorer_concurrency=(1, 2)).to_pandas()
        man = json.load(open(os.path.join(ck, "scores", "_MANIFEST.json")))
        return man["fingerprint"]

    fp1 = scores_fp(500)
    fp2 = scores_fp(300)  # upstream knob changed → scores must rerun
    assert fp1 != fp2


def test_embedding_lsh_multiprobe_recall(ray_session):
    """1-bit multi-probe must recover boundary-straddling near-dup
    pairs that plain sign-bucket LSH misses (and never lose found
    ones).  Exact all-pairs (num_buckets=0) is the recall denominator."""
    from dedupe_api_ray.extras.dedup import embedding_near_dup_pairs

    rng = np.random.RandomState(11)
    base = rng.normal(size=(150, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dup = base + rng.normal(scale=0.02, size=base.shape)  # cosine ~0.999
    vecs = np.vstack([base, dup])
    tbl = pa.table({"vec_id": pa.array(range(300), pa.int64()),
                    "embedding": pa.array(vecs.tolist(),
                                          pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(tbl).materialize()

    def pairs_of(**kw):
        df = embedding_near_dup_pairs(ds, threshold=0.99, **kw).to_pandas()
        return set(zip(df["id_a"], df["id_b"]))

    exact = pairs_of(num_buckets=0)
    assert len(exact) >= 140  # every (i, i+150) pair and few others
    plain = pairs_of(num_buckets=10, multiprobe=0)
    probed = pairs_of(num_buckets=10, multiprobe=1)
    assert plain <= exact and probed <= exact  # LSH never invents pairs
    r_plain = len(plain) / len(exact)
    r_probe = len(probed) / len(exact)
    assert r_probe >= r_plain
    assert r_probe >= 0.9, f"multi-probe recall {r_probe}"


def test_centroid_linkage_dendrogram_identity():
    """Engine (numpy) and oracle (pure-Python) centroid linkage must
    produce IDENTICAL merge sequences, including on all-tied unscored
    blocks (d2 = 1.0 everywhere) — the canonical tie-break."""
    from dedupe_api_ray.oracle import centroid_linkage
    from dedupe_api_ray.stages.clustering import centroid_linkage_np

    rng = np.random.RandomState(3)
    for trial in range(6):
        n = 8
        mat = np.ones((n, n), dtype=np.float64)
        np.fill_diagonal(mat, 0.0)
        d2 = {}
        n_edges = [0, 3, 8][trial % 3]  # incl. the all-tied case
        for _ in range(n_edges):
            i, j = sorted(rng.choice(n, 2, replace=False))
            v = float(np.round(rng.uniform(0.0, 0.9), 3))
            mat[i, j] = mat[j, i] = v
            d2[(int(i), int(j))] = v
        got = centroid_linkage_np(mat)
        want = centroid_linkage(n, d2)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_train_centroids_random_sample_on_sorted_input(ray_session):
    """Sorted/clustered input: a limit()-based sample would only see
    cluster A; the random sample must land centroids in BOTH clusters."""
    from dedupe_api_ray.extras.similarity import train_centroids

    rng = np.random.RandomState(7)
    a = rng.normal(loc=0.0, scale=0.05, size=(400, 8)) + np.r_[1, np.zeros(7)]
    b = rng.normal(loc=0.0, scale=0.05, size=(400, 8)) + np.r_[-1, np.zeros(7)]
    vecs = np.vstack([a, b])  # cluster A first, then cluster B
    tbl = pa.table({"vec_id": pa.array(range(800), pa.int64()),
                    "embedding": pa.array(vecs.tolist(),
                                          pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(tbl).materialize()
    cent = train_centroids(ds, n_centroids=4, sample_rows=64, iters=5)
    # at least one centroid must be nearer B's mean than A's
    am = a.mean(axis=0) / np.linalg.norm(a.mean(axis=0))
    bm_ = b.mean(axis=0) / np.linalg.norm(b.mean(axis=0))
    near_b = ((cent @ bm_) > (cent @ am)).sum()
    assert near_b >= 1, "random sample should reach the second cluster"
    assert near_b < len(cent), "and keep the first cluster covered"


def test_byte_based_broadcast_routing(ray_session):
    """r3: wide docs force the join path even below the ROW threshold
    (should_broadcast routes on bytes first), and results still match
    the broadcast path exactly."""
    from dedupe_api_ray.extras.dedup import jaccard_verify_pairs
    from dedupe_api_ray.utils import should_broadcast

    wide = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(6, dtype=np.int64)),
        "text": pa.array([("tok%d " % (i % 3)) * 4000 for i in range(6)]),
    })).materialize()
    assert should_broadcast(wide)                      # ~100 KB: fine
    assert not should_broadcast(wide, max_bytes=1000)  # byte-bound trips

    cands = ray.data.from_arrow(pa.table({
        "id_a": pa.array([0, 1, 2], pa.int64()),
        "id_b": pa.array([3, 4, 5], pa.int64())}))
    via_join = jaccard_verify_pairs(
        cands, wide, threshold=0.5,
        broadcast_max_bytes=1000).to_pandas().sort_values(
            ["id_a", "id_b"]).reset_index(drop=True)
    via_bcast = jaccard_verify_pairs(
        cands, wide, threshold=0.5).to_pandas().sort_values(
            ["id_a", "id_b"]).reset_index(drop=True)
    assert via_bcast.equals(via_join)
    assert len(via_bcast) == 3  # i%3 pairing: (0,3),(1,4),(2,5) identical


def test_gazetteer_canon_guard(ray_session):
    """r3: an oversized canonical side fails loudly in broadcast mode;
    since r4, mode='auto' routes it to the LSH scale path instead."""
    from dedupe_api_ray.pipelines.gazetteer import gazetteer_topn

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(10, dtype=np.int64)),
        "text": pa.array([f"alpha beta {i}" for i in range(10)]),
    })).materialize()
    with pytest.raises(RuntimeError, match="broadcast bound"):
        gazetteer_topn(ds, ds, n=1, canon_max_rows=5, mode="broadcast")
    # auto above the bound: LSH path, no raise, same top-1
    auto = gazetteer_topn(ds, ds, n=1, threshold=0.1, canon_max_rows=5)
    exact = gazetteer_topn(ds, ds, n=1, threshold=0.1, mode="broadcast")
    a = auto.to_pandas().sort_values(["query_id", "canon_id"]).reset_index(drop=True)
    e = exact.to_pandas().sort_values(["query_id", "canon_id"]).reset_index(drop=True)
    assert len(e) > 0 and a.equals(e)
