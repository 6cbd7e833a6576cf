"""Property/invariant tests (SURVEY.md §5.4/§5.5): byte-identical
extraction across parallelism, permutation invariance of clustering,
kernel symmetry."""

import hashlib

import pyarrow as pa
import pytest

import ray
import ray.data

from dedupe_api_ray.fixtures import record_id_of_url
from dedupe_api_ray.model import FieldDef, train_model


def test_extraction_byte_identical_across_parallelism(ray_session, tiny_corpus):
    """The per-row invariant from BASELINE.json input_hint: extracted
    text per url is byte-identical — across runs AND block layouts."""
    from dedupe_api_ray.functions.text import extract_text_batch

    pages = tiny_corpus["pages"]

    def run(num_blocks: int) -> dict[str, str]:
        ds = ray.data.from_arrow(pages).repartition(num_blocks)
        out = ds.map_batches(
            lambda t: extract_text_batch(t, "html", "text_x")
            .select(["url", "text_x"]),
            batch_format="pyarrow").to_pandas()
        return {u: hashlib.md5(t.encode()).hexdigest()
                for u, t in zip(out["url"], out["text_x"])}

    h1 = run(1)
    h8 = run(8)
    assert h1 == h8
    # and equals the stored text column (generation-time invariant)
    stored = {u: hashlib.md5(t.encode()).hexdigest()
              for u, t in zip(pages["url"].to_pylist(),
                              pages["text"].to_pylist())}
    assert h1 == stored


def test_clustering_invariant_under_permutation(ray_session, tabular_fixture):
    """Same entity map regardless of input row order (SURVEY.md §5.4)."""
    from dedupe_api_ray.pipelines.dedupe import partition

    tbl = tabular_fixture["records"]
    cols = tbl.to_pydict()
    records = {rid: {k: cols[k][i] for k in ("name", "address", "zip", "phone")}
               for i, rid in enumerate(cols["record_id"])}
    lp = tabular_fixture["labeled_pairs"].to_pydict()
    labeled = list(zip(lp["id_a"], lp["id_b"], lp["label"]))
    fields = [FieldDef("name", "String"), FieldDef("address", "String"),
              FieldDef("zip", "Exact"),
              FieldDef("phone", "String", has_missing=True)]
    model = train_model(records, labeled, fields, max_predicates=2)

    def run(t: pa.Table):
        em = partition(ray.data.from_arrow(t), model, threshold=0.5,
                       scorer_concurrency=(1, 2)).to_pandas()
        return dict(zip(em["record_id"], em["cluster_id"]))

    import numpy as np
    a1 = run(tbl)
    perm = np.random.RandomState(3).permutation(tbl.num_rows)
    a2 = run(tbl.take(pa.array(perm)))
    assert a1 == a2


def test_kernel_symmetry_and_range():
    from dedupe_api_ray.functions import kernels

    pairs = [("main st", "main street"), ("a", "b"), ("x y z", "z y x")]
    for a, b in pairs:
        assert kernels.normalized_affine_gap(a, b) == pytest.approx(
            kernels.normalized_affine_gap(b, a))
        ta, tb = a.split(), b.split()
        assert kernels.cosine_similarity(ta, tb) == pytest.approx(
            kernels.cosine_similarity(tb, ta))
        assert 0.0 <= kernels.cosine_similarity(ta, tb) <= 1.0
        assert 0.0 <= kernels.jaccard(ta, tb) <= 1.0


def test_driver_cc_label_propagation_random_graphs(ray_session):
    """Vectorized min-label propagation == brute-force union-find on
    random graphs (component label = min record id)."""
    import numpy as np

    from dedupe_api_ray.stages.clustering import connected_components_driver

    rng = np.random.RandomState(7)
    for trial in range(5):
        n_nodes = int(rng.randint(5, 400))
        n_edges = int(rng.randint(1, 800))
        ids = rng.choice(np.arange(1000, 1000 + n_nodes * 3), size=n_nodes,
                         replace=False).astype(np.int64)
        u = rng.choice(ids, size=n_edges)
        v = rng.choice(ids, size=n_edges)
        keep = u != v
        u, v = u[keep], v[keep]
        if len(u) == 0:
            continue
        # brute force
        parent = {int(x): int(x) for x in np.concatenate([u, v])}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(u, v):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in parent}
        ds = ray.data.from_arrow(pa.table({"u": pa.array(u), "v": pa.array(v)}))
        got = connected_components_driver(ds).to_pandas()
        assert dict(zip(got["record_id"], got["component_id"])) == want, trial


def test_cluster_partition_kernel_equals_per_component(ray_session):
    """cluster_scored_pairs (one kernel call per component-hash
    partition, vectorized single-edge fast path) emits exactly the
    per-component ComponentClusterer rows."""
    import numpy as np
    import pandas as pd

    from dedupe_api_ray.stages.clustering import (ComponentClusterer,
                                                  cluster_scored_pairs,
                                                  connected_components_driver)

    rng = np.random.RandomState(11)
    rows_a, rows_b, rows_s = [], [], []
    # a mix: many single-edge components, a few multi-edge ones
    next_id = 0
    for _ in range(40):  # single-edge
        rows_a.append(next_id)
        rows_b.append(next_id + 1)
        rows_s.append(float(rng.uniform(0.5, 1.0)))
        next_id += 2
    for size in (3, 5, 9, 30):  # connected multi-edge components
        ids = np.arange(next_id, next_id + size)
        next_id += size
        for i in range(size - 1):  # spanning chain keeps it connected
            rows_a.append(int(ids[i]))
            rows_b.append(int(ids[i + 1]))
            rows_s.append(float(rng.uniform(0.5, 1.0)))
        for _ in range(size):  # extra random in-component edges
            i, j = rng.choice(size, 2, replace=False)
            a, b = int(ids[min(i, j)]), int(ids[max(i, j)])
            rows_a.append(a)
            rows_b.append(b)
            rows_s.append(float(rng.uniform(0.5, 1.0)))
    df = pd.DataFrame({"id_a": rows_a, "id_b": rows_b,
                       "score": rows_s}).drop_duplicates(["id_a", "id_b"])
    scored = ray.data.from_pandas(df)
    got = cluster_scored_pairs(scored, threshold=0.5).to_pandas() \
        .sort_values("record_id").reset_index(drop=True)

    # reference: per-component ComponentClusterer
    edges = ray.data.from_arrow(pa.table({
        "u": pa.array(df["id_a"].to_numpy(), pa.int64()),
        "v": pa.array(df["id_b"].to_numpy(), pa.int64())}))
    labels = connected_components_driver(edges).to_pandas()
    lab = dict(zip(labels["record_id"], labels["component_id"]))
    df["component_id"] = df["id_a"].map(lab)
    clusterer = ComponentClusterer(0.5)
    want = pd.concat([clusterer(g) for _, g in df.groupby("component_id")],
                     ignore_index=True).sort_values("record_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["record_id", "cluster_id", "confidence"]],
        want[["record_id", "cluster_id", "confidence"]])


def test_partition_scale_paths_match_broadcast_paths(
        ray_session, tabular_fixture, monkeypatch):
    """The join/shuffle SCALE paths (taken only above the broadcast /
    driver-route thresholds in production) must produce the same
    entity map as the small-size broadcast fast paths — forced here by
    patching the routing thresholds."""
    import pandas as pd

    import dedupe_api_ray.pipelines.dedupe as dp
    import dedupe_api_ray.stages.blocking as bl
    import dedupe_api_ray.utils as utils
    from dedupe_api_ray.pipelines.dedupe import partition

    tbl = tabular_fixture["records"]
    cols = tbl.to_pydict()
    records = {rid: {k: cols[k][i] for k in ("name", "address", "zip", "phone")}
               for i, rid in enumerate(cols["record_id"])}
    lp = tabular_fixture["labeled_pairs"].to_pydict()
    labeled = list(zip(lp["id_a"], lp["id_b"], lp["label"]))
    fields = [FieldDef("name", "String"), FieldDef("address", "String"),
              FieldDef("zip", "Exact"),
              FieldDef("phone", "String", has_missing=True)]
    model = train_model(records, labeled, fields, max_predicates=2)

    def run():
        return partition(ray.data.from_arrow(tbl), model, threshold=0.5,
                         scorer_concurrency=(1, 2)).to_pandas() \
            .sort_values("record_id").reset_index(drop=True)

    fast = run()
    monkeypatch.setattr(utils, "should_broadcast", lambda *a, **k: False)
    monkeypatch.setattr(dp, "COLLAPSE_DRIVER_MAX", -1)
    monkeypatch.setattr(bl, "COUNT_DRIVER_MAX", -1)
    slow = run()
    pd.testing.assert_frame_equal(
        fast[["record_id", "cluster_id", "confidence"]],
        slow[["record_id", "cluster_id", "confidence"]])


def test_partition_pair_distinct_modes_match(ray_session, tabular_fixture):
    """pair_distinct="local" (skip the global pair-distinct sort; the
    clustering kernel dedups exactly) must produce the same entity map
    as the "exact" mode."""
    import pandas as pd

    from dedupe_api_ray.pipelines.dedupe import partition

    tbl = tabular_fixture["records"]
    cols = tbl.to_pydict()
    records = {rid: {k: cols[k][i] for k in ("name", "address", "zip", "phone")}
               for i, rid in enumerate(cols["record_id"])}
    lp = tabular_fixture["labeled_pairs"].to_pydict()
    labeled = list(zip(lp["id_a"], lp["id_b"], lp["label"]))
    fields = [FieldDef("name", "String"), FieldDef("address", "String"),
              FieldDef("zip", "Exact"),
              FieldDef("phone", "String", has_missing=True)]
    model = train_model(records, labeled, fields, max_predicates=2)

    def run(mode):
        return partition(ray.data.from_arrow(tbl), model, threshold=0.5,
                         scorer_concurrency=(1, 2),
                         pair_distinct=mode).to_pandas() \
            .sort_values("record_id").reset_index(drop=True)

    exact = run("exact")
    pd.testing.assert_frame_equal(exact, run("local"))
    # "auto" resolves deterministically from expected pair volume
    # (tiny here -> exact) and must match regardless of which side of
    # the crossover it lands on
    pd.testing.assert_frame_equal(exact, run("auto"))
    import dedupe_api_ray.stages.blocking as B
    old = B.LOCAL_DISTINCT_MIN_PAIRS
    B.LOCAL_DISTINCT_MIN_PAIRS = 0  # force the local side of auto
    try:
        pd.testing.assert_frame_equal(exact, run("auto"))
    finally:
        B.LOCAL_DISTINCT_MIN_PAIRS = old


def test_cluster_partition_dedups_duplicate_edges(ray_session):
    """_cluster_partition is the global distinct point for
    candidate_pairs(distinct="local"): duplicate (id_a, id_b) edges
    with identical scores must not change any output — including the
    oversized-component path, whose np.add.at degree sums are the one
    place duplicates would corrupt values."""
    import numpy as np
    import pandas as pd

    from dedupe_api_ray.stages.clustering import _cluster_partition

    # component 1: a 5-node chain (> max_cluster_size=3 → oversized
    # transitive path); component 100: one edge duplicated 3×
    base = pd.DataFrame({
        "component_id": [1, 1, 1, 1, 100],
        "id_a": [1, 2, 3, 4, 100],
        "id_b": [2, 3, 4, 5, 101],
        "score": [0.9, 0.8, 0.7, 0.95, 0.6]})
    dup = pd.concat([base, base.iloc[[0, 2, 4, 4]]], ignore_index=True) \
        .sample(frac=1.0, random_state=7).reset_index(drop=True)
    out_base = _cluster_partition(base, 0.5, 3) \
        .sort_values("record_id").reset_index(drop=True)
    out_dup = _cluster_partition(dup, 0.5, 3) \
        .sort_values("record_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out_base, out_dup)
    assert set(out_base["record_id"]) == {1, 2, 3, 4, 5, 100, 101}
