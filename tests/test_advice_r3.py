"""Regression tests for the round-3 ADVICE findings: Text-only-model
scoring with sidecar-excluded payload, min-label single-edge clusters,
one-sided salted cross segments, and half-away-from-zero rounding."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from dedupe_api_ray.model import FieldDef, Model, PredicateSpec


def _text_only_model() -> Model:
    return Model(field_defs=[FieldDef("text", "Text")],
                 predicates=[PredicateSpec("simple", "text",
                                           "firstTokenPredicate")],
                 weights=np.array([10.0]), bias=-8.0, idf={})


def test_partition_text_only_model_with_candidate_pairs(ray_session):
    """ADVICE high: a model whose ONLY field is a sidecar-covered Text
    field ships no a_/b_ pair columns at all; the scorer must derive
    the pair count from the batch, not from recs_a (StopIteration)."""
    from dedupe_api_ray.pipelines.dedupe import partition

    texts = ["shared prefix alpha beta gamma delta",
             "shared prefix alpha beta gamma delta epsilon",
             "shared prefix totally different words here now",
             "unrelated zeta eta theta iota"]
    docs = ray.data.from_arrow(pa.table({
        "record_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(texts, pa.string())}))
    em = partition(docs, _text_only_model(), threshold=0.5,
                   scorer_concurrency=1).to_pandas()
    assert len(em) == 4
    m = dict(zip(em["record_id"], em["cluster_id"]))
    assert m[1] == m[2] == 1          # near-identical texts cluster
    assert m[4] == 4                  # singleton stays itself


def test_sidecar_cosine_matches_scalar_kernel(ray_session):
    """The rank-composite searchsorted intersection (r4 rewrite of the
    lexsort merge) must equal the scalar cosine kernel on every pair —
    including cross-shard pairs, zero-overlap pairs, featureless docs
    and ids absent from the sidecar."""
    import itertools

    from dedupe_api_ray.functions.kernels import cosine_similarity
    from dedupe_api_ray.functions.text import tokens_of
    from dedupe_api_ray.stages.scoring import PairScorer, build_tf_sidecar

    rng = np.random.RandomState(5)
    vocab = [f"tok{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, rng.randint(3, 25)).tolist())
             for _ in range(30)]
    texts[7] = ""                     # featureless doc
    texts[11] = "zzz yyy xxx"         # zero overlap with most
    ids = list(range(100, 130))       # ids spread over shards (% k)
    docs = ray.data.from_arrow(pa.table({
        "record_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))
    model = _text_only_model()
    sidecar = build_tf_sidecar(docs, model, num_shards=4)
    scorer = PairScorer(model, sidecar_refs=sidecar)

    pairs = [(a, b) for a, b in itertools.combinations(ids, 2)]
    pairs.append((ids[0], 999_999))   # id absent from the sidecar
    batch = pa.table({
        "id_a": pa.array([p[0] for p in pairs], pa.int64()),
        "id_b": pa.array([p[1] for p in pairs], pa.int64())})
    got = scorer._cosine_sidecar("text", batch)
    by_id = dict(zip(ids, texts))
    for (a, b), v in zip(pairs, got):
        ta, tb = (tokens_of(by_id.get(a, "")) or None,
                  tokens_of(by_id.get(b, "")) or None)
        want = cosine_similarity(ta, tb)
        if np.isnan(want):
            assert np.isnan(v), (a, b)
        else:
            assert v == pytest.approx(want, abs=1e-9), (a, b)


def test_single_edge_cluster_id_is_min_for_unordered_pairs(ray_session):
    """ADVICE low: direct callers of cluster_scored_pairs with
    UNORDERED pairs must still get cluster_id = min(id_a, id_b)."""
    from dedupe_api_ray.stages.clustering import cluster_scored_pairs

    scored = ray.data.from_arrow(pa.table({
        "id_a": pa.array([9], pa.int64()),      # deliberately id_a > id_b
        "id_b": pa.array([3], pa.int64()),
        "score": pa.array([0.9], pa.float32())}))
    out = cluster_scored_pairs(scored, threshold=0.5).to_pandas()
    assert sorted(out["record_id"]) == [3, 9]
    assert set(out["cluster_id"]) == {3}


def test_one_sided_cross_segment_emits_nothing():
    """ADVICE low: a salted cross segment holding only one side's rows
    (skewed salted block) must emit no pairs — its within-sub pairs
    belong to the diagonal groups."""
    from dedupe_api_ray.stages.blocking import _emit_pairs_partition

    # left-only cross segment (side -1): nothing
    g = pd.DataFrame({"block_key": ["k#0.1"] * 3,
                      "record_id": [1, 2, 3],
                      "side": np.array([-1, -1, -1], np.int8)})
    assert len(_emit_pairs_partition(g)) == 0
    # right-only cross segment (side +1): nothing (symmetric now)
    g["side"] = np.array([1, 1, 1], np.int8)
    assert len(_emit_pairs_partition(g)) == 0
    # two-sided cross segment: left x right only
    g2 = pd.DataFrame({"block_key": ["k#0.1"] * 4,
                       "record_id": [1, 3, 2, 4],
                       "side": np.array([-1, -1, 1, 1], np.int8)})
    out = _emit_pairs_partition(g2)
    got = set(zip(out["id_a"], out["id_b"]))
    assert got == {(1, 2), (1, 4), (2, 3), (3, 4)}
    # diagonal (triangle) group unaffected
    g3 = pd.DataFrame({"block_key": ["k#1.1"] * 3,
                       "record_id": [5, 6, 7],
                       "side": np.array([0, 0, 0], np.int8)})
    out3 = _emit_pairs_partition(g3)
    assert set(zip(out3["id_a"], out3["id_b"])) == {(5, 6), (5, 7), (6, 7)}


def test_salting_lossless_with_one_sided_fix(ray_session):
    """End-to-end: salted candidate pairs == unsalted pairs on the
    same blocking map (losslessness survives the one-sided-skip)."""
    from dedupe_api_ray.stages.blocking import candidate_pairs

    rng = np.random.RandomState(7)
    # one hot key (60 rows) + several cold keys
    keys = ["hot"] * 60 + [f"cold{i % 5}" for i in range(25)]
    rids = rng.permutation(len(keys)).astype(np.int64)
    bm = ray.data.from_arrow(pa.table({
        "block_key": pa.array(keys, pa.string()),
        "record_id": pa.array(rids, pa.int64())}))
    plain = candidate_pairs(bm, max_block_size=1000, hard_cap=10**9)
    salted = candidate_pairs(bm, max_block_size=8, hard_cap=10**9)
    p = set(zip(*plain.to_pandas()[["id_a", "id_b"]].to_numpy().T))
    s = set(zip(*salted.to_pandas()[["id_a", "id_b"]].to_numpy().T))
    assert p == s and len(p) > 0


def test_sessionize_rounding_half_away_from_zero():
    """ADVICE low: a session sum landing exactly on a half-cent must
    round away from zero (DuckDB round()), not to even (np.round)."""
    from dedupe_api_ray.extras.sessions import _sessionize_partition

    g = pd.DataFrame({
        "user_id": np.array([1], np.int64),
        "event_id": np.array([1], np.int64),
        "ts": pd.to_datetime(["2024-01-01T00:00:00"]),
        "value": np.array([0.125], np.float64)})  # 12.5 cents exactly
    out = _sessionize_partition(g, gap_us=60_000_000)
    assert out["sum_value_cents"].iloc[0] == 13  # not 12 (banker's)


def test_round_half_away_helper():
    from dedupe_api_ray.utils import round_half_away

    v = np.array([77.0 / 128.0, -77.0 / 128.0, 0.25])
    r = round_half_away(v, 6)
    assert r[0] == 0.601563 and r[1] == -0.601563 and r[2] == 0.25


def test_hard_cap_sampling_keeps_partial_coverage(ray_session):
    """r3 VERDICT 'what's wrong' #1: keys above hard_cap keep a
    deterministic sampled pair subset instead of losing ALL coverage."""
    import pyarrow as pa

    from dedupe_api_ray.stages.blocking import candidate_pairs

    n = 400
    bm = ray.data.from_arrow(pa.table({
        "block_key": pa.array(["stop"] * n + ["cold"] * 3, pa.string()),
        "record_id": pa.array(list(range(n)) + [1000, 1001, 1002],
                              pa.int64())}))

    m_drop: dict = {}
    dropped = candidate_pairs(bm, max_block_size=20, hard_cap=100,
                              hard_cap_mode="drop", metrics=m_drop)
    dd = dropped.to_pandas()
    assert m_drop["dropped_keys"] == 1 and m_drop["est_pair_recall"] == 0.0
    # only the cold key's 3 pairs survive
    assert len(dd) == 3 and set(dd.id_a).issubset({1000, 1001})

    m_s: dict = {}
    sampled = candidate_pairs(bm, max_block_size=20, hard_cap=100,
                              hard_cap_mode="sample", metrics=m_s)
    s1 = sampled.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert m_s["sampled_keys"] == 1 and m_s["dropped_keys"] == 0
    assert 0 < m_s["est_pair_recall"] < 1
    # partial coverage of the hot key survives (far more than cold's 3,
    # far less than the full 400*399/2)
    assert 100 < len(s1) < n * (n - 1) / 2
    # deterministic: identical pair set on a rerun
    s2 = candidate_pairs(bm, max_block_size=20, hard_cap=100,
                         hard_cap_mode="sample").to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert s1.equals(s2)


def test_hard_cap_sample_pair_budget(ray_session):
    """Sampled stopword keys are pair-BUDGETED: a member cap alone is
    quadratic in surviving pairs (2M pairs/key at hard_cap=2000 — half
    the 474k-page scoring stage for ~0 recall), so the member sample
    target is min(hard_cap, ~sqrt(2*max_sampled_pairs))."""
    import pyarrow as pa

    from dedupe_api_ray.stages.blocking import candidate_pairs

    n = 3000
    bm = ray.data.from_arrow(pa.table({
        "block_key": pa.array(["stop"] * n, pa.string()),
        "record_id": pa.array(list(range(n)), pa.int64())}))

    m: dict = {}
    got = candidate_pairs(bm, max_block_size=20, hard_cap=200,
                          max_sampled_pairs=500, metrics=m).count()
    # budget 500 -> member target ~32 (C(32,2)=496): far below the
    # member-cap-only volume C(200,2)=19900
    assert m["sample_target_members"] < 40
    assert got < 2_000
    # the budget never RAISES the member target above hard_cap
    m2: dict = {}
    candidate_pairs(bm, max_block_size=20, hard_cap=50,
                    max_sampled_pairs=10**9, metrics=m2).count()
    assert m2["sample_target_members"] == 50


def test_gazetteer_lsh_mode_matches_broadcast(ray_session):
    """VERDICT #6: the LSH scale mode (no broadcast of either side)
    yields the same per-query top-n as the exact broadcast scan."""
    from dedupe_api_ray.pipelines.gazetteer import gazetteer_topn

    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, 12, replace=False)) for _ in range(40)]
    # make some strong near-matches so top-n is non-trivial
    for i in range(0, 40, 5):
        texts[i + 1] = texts[i].replace(texts[i].split()[0], "w99")
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    queries = docs.filter(lambda r: r["doc_id"] < 8)

    def norm(ds):
        df = ds.to_pandas().sort_values(
            ["query_id", "canon_id"]).reset_index(drop=True)
        return df

    exact = norm(gazetteer_topn(queries, docs, n=2, threshold=0.3,
                                mode="broadcast"))
    lsh = norm(gazetteer_topn(queries, docs, n=2, threshold=0.3,
                              mode="lsh", lsh_num_perm=64, lsh_bands=64))
    assert exact.equals(lsh), (exact, lsh)
    assert len(exact) > 0


def test_sidecar_thread_exception_propagates(ray_session, monkeypatch):
    """The eager (threaded) sidecar build re-raises its exception on
    join inside do_score instead of dying silently on the daemon
    thread and leaving the scorer with sidecar=None."""
    import dedupe_api_ray.stages.scoring as scoring
    from dedupe_api_ray.pipelines.dedupe import partition

    def boom(records, model, num_shards=None):
        raise RuntimeError("sidecar exploded")

    monkeypatch.setattr(scoring, "build_tf_sidecar", boom)
    docs = ray.data.from_arrow(pa.table({
        "record_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["shared token run one",
                          "shared token run two"], pa.string())}))
    with pytest.raises(RuntimeError, match="sidecar exploded"):
        partition(docs, _text_only_model(), threshold=0.5,
                  scorer_concurrency=1).to_pandas()


def test_scores_resume_skips_sidecar_build(ray_session, tmp_path,
                                           monkeypatch):
    """A run whose scores stage checkpoint-resumes must not pay the
    eager sidecar build at all (the thread is only started when the
    scores manifest does not validate)."""
    import dedupe_api_ray.stages.scoring as scoring
    from dedupe_api_ray.pipelines.dedupe import partition

    docs = ray.data.from_arrow(pa.table({
        "record_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha beta gamma", "alpha beta gamma delta",
                          "unrelated words entirely"], pa.string())}))
    model = _text_only_model()
    ck = str(tmp_path / "ck")
    em1 = partition(docs, model, threshold=0.5, scorer_concurrency=1,
                    ckpt_dir=ck).to_pandas()

    calls = {"n": 0}
    real = scoring.build_tf_sidecar

    def counting(records, mdl, num_shards=None):
        calls["n"] += 1
        return real(records, mdl, num_shards)

    monkeypatch.setattr(scoring, "build_tf_sidecar", counting)
    em2 = partition(docs, model, threshold=0.5, scorer_concurrency=1,
                    ckpt_dir=ck).to_pandas()
    assert calls["n"] == 0
    pd.testing.assert_frame_equal(
        em1.sort_values("record_id").reset_index(drop=True),
        em2.sort_values("record_id").reset_index(drop=True))
