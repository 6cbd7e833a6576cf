"""Checkpoint-resume, webtext flagship parity, and extras coverage."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from dedupe_api_ray.fixtures import pairwise_f1, record_id_of_url
from dedupe_api_ray.model import FieldDef, train_model
from dedupe_api_ray.oracle import oracle_partition

PAGES_FIELDS = [FieldDef("text", "Text"), FieldDef("url_host", "ShortString")]


def _pages_setup(tiny_corpus):
    cols = tiny_corpus["pages"].to_pydict()
    records = {record_id_of_url(u): {"text": t, "url_host": u.split("/")[2]}
               for u, t in zip(cols["url"], cols["text"])}
    lp = tiny_corpus["labeled_pairs"].to_pydict()
    labeled = list(zip(lp["id_a"], lp["id_b"], lp["label"]))
    model = train_model(records, labeled, PAGES_FIELDS, max_predicates=3)
    tbl = pa.table({
        "record_id": pa.array(sorted(records), pa.int64()),
        "text": pa.array([records[r]["text"] for r in sorted(records)]),
        "url_host": pa.array([records[r]["url_host"] for r in sorted(records)]),
    })
    return records, model, tbl


def test_pages_flagship_parity_and_gold(ray_session, tiny_corpus):
    """The webtext flagship: engine vs oracle F1>=0.99 AND vs gold
    clusters F1>=0.9 (SURVEY.md §5.3, BASELINE.md)."""
    from dedupe_api_ray.pipelines.dedupe import partition

    records, model, tbl = _pages_setup(tiny_corpus)
    em = partition(ray.data.from_arrow(tbl), model, threshold=0.5,
                   scorer_concurrency=(1, 2)).to_pandas()
    engine_assign = dict(zip(em["record_id"], em["cluster_id"]))

    oracle_assign = oracle_partition(records, model, threshold=0.5)
    f1 = pairwise_f1(engine_assign,
                     {r: c for r, (c, _) in oracle_assign.items()})
    assert f1 >= 0.99, f"pages engine-vs-oracle F1 {f1}"

    gold_cols = tiny_corpus["gold_clusters"].to_pydict()
    gold = dict(zip(gold_cols["record_id"], gold_cols["cluster_id"]))
    f1_gold = pairwise_f1(engine_assign, gold)
    assert f1_gold >= 0.9, f"pages engine-vs-gold F1 {f1_gold}"


def test_checkpoint_resume_equals_fresh(ray_session, tiny_corpus, tmp_path):
    """SURVEY.md §5.4: kill-after-stage-k resume — here simulated by
    rerunning with a warm checkpoint dir and by invalidating a late
    stage; outputs must be identical to the fresh run."""
    import json
    import os
    import shutil

    from dedupe_api_ray.pipelines.dedupe import partition

    records, model, tbl = _pages_setup(tiny_corpus)
    ck = str(tmp_path / "ckpt")

    def run():
        em = partition(ray.data.from_arrow(tbl), model, threshold=0.5,
                       ckpt_dir=ck, scorer_concurrency=(1, 2)).to_pandas()
        return em.sort_values("record_id").reset_index(drop=True)

    fresh = run()
    assert os.path.exists(os.path.join(ck, "scores", "_MANIFEST.json"))
    # warm resume: all manifests valid → stages skipped, same output
    warm = run()
    assert fresh.equals(warm)
    # partial resume: invalidate the scores stage only
    shutil.rmtree(os.path.join(ck, "scores"))
    partial = run()
    assert fresh.equals(partial)
    man = json.load(open(os.path.join(ck, "scores", "_MANIFEST.json")))
    assert man["row_count"] >= 0 and man["code_version"]


def test_minhash_near_dup_recall(ray_session, tiny_corpus):
    """MinHash-LSH near-dup must recover most gold duplicate pairs
    whose token Jaccard is actually above the verify threshold."""
    from dedupe_api_ray.extras.dedup import near_dup_pairs_minhash

    cols = tiny_corpus["pages"].to_pydict()
    tbl = pa.table({
        "doc_id": pa.array([record_id_of_url(u) for u in cols["url"]], pa.int64()),
        "text": pa.array(cols["text"], pa.string()),
    })
    out = near_dup_pairs_minhash(ray.data.from_arrow(tbl), threshold=0.5,
                                 num_perm=32, bands=16).to_pandas()
    found = set(zip(out["id_a"], out["id_b"]))

    from dedupe_api_ray.functions.text import TOKEN_RE
    gold_cols = tiny_corpus["gold_clusters"].to_pydict()
    by_cluster: dict[int, list[int]] = {}
    rid_text = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    for rid, c in zip(gold_cols["record_id"], gold_cols["cluster_id"]):
        by_cluster.setdefault(c, []).append(rid)
    gold_pairs = []
    for members in by_cluster.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                sa = set(TOKEN_RE.findall(rid_text[ms[i]].lower()))
                sb = set(TOKEN_RE.findall(rid_text[ms[j]].lower()))
                jac = len(sa & sb) / max(1, len(sa | sb))
                if jac >= 0.6:  # clearly above the 0.5 verify threshold
                    gold_pairs.append((ms[i], ms[j]))
    assert gold_pairs, "fixture should contain strong near-dups"
    recall = sum(p in found for p in gold_pairs) / len(gold_pairs)
    assert recall >= 0.8, f"minhash near-dup recall {recall}"


def test_exact_dedup_and_simhash(ray_session):
    from dedupe_api_ray.extras.dedup import exact_dedup_keep_min, simhash_table

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["aaa bbb", "ccc", "aaa bbb", "ddd", "ccc"]),
    })
    ds = ray.data.from_arrow(tbl)
    kept = sorted(exact_dedup_keep_min(ds).to_pandas()["doc_id"])
    assert kept == [1, 2, 4]
    sh = simhash_table(ds).to_pandas()
    m = dict(zip(sh["doc_id"], sh["simhash"]))
    assert m[1] == m[3] and m[2] == m[5] and m[1] != m[4]


def test_simhash_near_dup_equals_brute_force(ray_session):
    """Pigeonhole chunk blocking has recall 1.0 by construction: the
    distributed pair set must EQUAL the O(n^2) popcount sweep."""
    from dedupe_api_ray.extras.dedup import (simhash63_md5,
                                             simhash_near_dup_pairs)

    rng = np.random.RandomState(7)
    words = [f"w{i}" for i in range(240)]
    texts = []
    for i in range(40):
        # 60-token docs: a one-token perturbation lands mostly within
        # hamming <= 3 of its twin (vote margins are wide)
        base = [words[j] for j in rng.choice(240, size=60, replace=False)]
        texts.append(" ".join(base))
        if i % 2 == 0:  # twin doc
            texts.append(" ".join(base[:-1] + [words[rng.randint(240)]]))
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl)
    got = simhash_near_dup_pairs(ds, max_hamming=3).to_pandas()
    got_set = {(a, b, h) for a, b, h in
               zip(got["id_a"], got["id_b"], got["hamming"])}
    sigs = [simhash63_md5(t) for t in texts]
    want = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            h = bin(sigs[i] ^ sigs[j]).count("1")
            if h <= 3:
                want.add((i, j, h))
    assert got_set == want
    assert want, "fixture should contain close signatures"


def test_topk_brute_force_vs_ivf(ray_session):
    """IVF with nprobe = all centroids must equal brute force."""
    from dedupe_api_ray.extras.similarity import brute_force_topk, ivf_topk

    rng = np.random.RandomState(0)
    vecs = rng.normal(size=(300, 16))
    tbl = pa.table({"vec_id": pa.array(range(300), pa.int64()),
                    "embedding": pa.array(vecs.tolist(),
                                          pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tbl).materialize()
    q = vecs[:5]
    qids = np.arange(5)
    bf = brute_force_topk(ds, q, qids, k=3).to_pandas()
    m_full = {}
    ivf = ivf_topk(ds, q, qids, k=3, n_centroids=4, nprobe=4,
                   metrics=m_full).to_pandas()
    key = lambda df: sorted(zip(df["query_id"], df["vec_id"]))
    assert key(bf) == key(ivf)
    assert m_full["probed_partitions"] == m_full["total_partitions"]


def test_ivf_partition_pruning(ray_session, tmp_path):
    """r3: the materialized index is probed selectively — with
    nprobe < n_centroids only the probed partition directories are
    read, and a reused index answers without rebuilding."""
    from dedupe_api_ray.extras.similarity import (ivf_build_index,
                                                  ivf_topk_indexed)

    rng = np.random.RandomState(1)
    vecs = rng.normal(size=(400, 16))
    tbl = pa.table({"vec_id": pa.array(range(400), pa.int64()),
                    "embedding": pa.array(vecs.tolist(),
                                          pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tbl).materialize()
    idx = str(tmp_path / "ivf")
    ivf_build_index(ds, idx, n_centroids=8)

    metrics = {}
    res = ivf_topk_indexed(idx, vecs[:3], np.arange(3), k=3, nprobe=2,
                           metrics=metrics).to_pandas()
    assert metrics["total_partitions"] >= 4
    assert 0 < metrics["probed_partitions"] < metrics["total_partitions"]
    assert set(res["query_id"]) == {0, 1, 2}
    # each query's own vector lives in its top partition: self-match
    for qi in range(3):
        assert qi in set(res[res["query_id"] == qi]["vec_id"])


def test_gazetteer_and_recordlink(ray_session):
    from dedupe_api_ray.model import Model, PredicateSpec
    from dedupe_api_ray.pipelines.gazetteer import gazetteer_topn
    from dedupe_api_ray.pipelines.recordlink import recordlink_candidate_pairs

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "record_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["alpha beta gamma", "alpha beta delta",
                          "omega psi chi", "alpha beta gamma extra"]),
    })
    ds = ray.data.from_arrow(docs).materialize()
    top = gazetteer_topn(ds, ds, n=1, threshold=0.1).to_pandas()
    best = dict(zip(top["query_id"], top["canon_id"]))
    assert best[1] == 4 or best[1] == 2  # highest-jaccard neighbor
    assert 3 not in best  # disjoint tokens → no match above threshold

    model = Model(field_defs=[FieldDef("text", "Text")],
                  predicates=[PredicateSpec("simple", "text",
                                            "firstTokenPredicate")],
                  weights=np.array([1.0]), bias=0.0)
    a = ray.data.from_arrow(docs.slice(0, 2))
    b = ray.data.from_arrow(docs.slice(2, 2))
    pairs = recordlink_candidate_pairs(a, b, model).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    # only doc 4 shares the first token 'alpha' with docs 1 and 2
    assert got == {(1, 4), (2, 4)}


def test_minhash_shingles_order_sensitive(ray_session):
    """w-shingle MinHash separates docs that share the token SET but
    not the token ORDER; unigram MinHash cannot."""
    import pyarrow.compute as pc

    from dedupe_api_ray.extras.dedup import (lsh_candidate_pairs,
                                             minhash_band_rows)

    fwd = " ".join(f"w{i}" for i in range(50))
    rev = " ".join(f"w{i}" for i in reversed(range(50)))
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array([fwd, rev, fwd + " extra"])})
    ds = ray.data.from_arrow(tbl).materialize()

    def cands(shingle_size):
        bands = minhash_band_rows(ds, num_perm=32, bands=16,
                                  shingle_size=shingle_size)
        df = lsh_candidate_pairs(bands.map_batches(
            lambda t: pa.table({"band_key": pc.cast(t["band_key"],
                                                    pa.string()),
                                "doc_id": t["doc_id"]}),
            batch_format="pyarrow")).to_pandas()
        return {(a, b) for a, b in zip(df["id_a"], df["id_b"])}

    uni = cands(1)
    tri = cands(3)
    assert (0, 1) in uni          # same token set → unigram collides
    assert (0, 1) not in tri      # shingles see the different order
    assert (0, 2) in tri          # near-identical stream still found
