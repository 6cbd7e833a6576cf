"""Degenerate-input behavior: empty datasets, single records,
all-identical corpora — the shapes a 100 TB run hits in stray
partitions and that must not crash or mis-cluster."""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from dedupe_api_ray.model import FieldDef, Model, PredicateSpec


def _model():
    return Model(field_defs=[FieldDef("text", "Text")],
                 predicates=[PredicateSpec("simple", "text",
                                           "firstTokenPredicate")],
                 weights=np.array([10.0]), bias=-8.0, idf={})


def _docs(texts):
    return ray.data.from_arrow(pa.table({
        "record_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def test_partition_single_record(ray_session):
    from dedupe_api_ray.pipelines.dedupe import partition

    em = partition(_docs(["only one document"]), _model(),
                   threshold=0.5, scorer_concurrency=(1, 2)).to_pandas()
    assert len(em) == 1
    assert em["cluster_id"].iloc[0] == em["record_id"].iloc[0]
    assert em["confidence"].iloc[0] == 1.0


def test_partition_all_identical(ray_session):
    from dedupe_api_ray.pipelines.dedupe import partition

    em = partition(_docs(["same text here"] * 25), _model(),
                   threshold=0.5, scorer_concurrency=(1, 2)).to_pandas()
    assert len(em) == 25
    assert em["cluster_id"].nunique() == 1           # one entity
    assert em["cluster_id"].unique()[0] == 0          # min record_id
    assert (em["confidence"] == 1.0).all()            # exact dupes


def test_partition_no_matches(ray_session):
    from dedupe_api_ray.pipelines.dedupe import partition

    texts = [f"unique{i} totally distinct content {i}" for i in range(10)]
    em = partition(_docs(texts), _model(), threshold=0.5,
                   scorer_concurrency=(1, 2)).to_pandas()
    assert len(em) == 10
    assert em["cluster_id"].nunique() == 10           # all singletons


def test_partition_empty_and_null_texts(ray_session):
    from dedupe_api_ray.pipelines.dedupe import partition

    tbl = pa.table({
        "record_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["real document text", None, "", "real document text"],
                         pa.string())})
    em = partition(ray.data.from_arrow(tbl), _model(), threshold=0.5,
                   scorer_concurrency=(1, 2)).to_pandas()
    assert len(em) == 4
    m = dict(zip(em["record_id"], em["cluster_id"]))
    assert m[0] == m[3]                               # exact dupes merge
    assert m[1] != m[0] and m[2] != m[0]              # blanks stay apart


def test_near_dup_ops_on_empty_dataset(ray_session):
    from dedupe_api_ray.extras.dedup import (exact_dedup_keep_min,
                                             near_dup_pairs_minhash,
                                             simhash_near_dup_pairs)

    empty = _docs([]).map_batches(
        lambda t: pa.table({"doc_id": t["record_id"], "text": t["text"]}),
        batch_format="pyarrow")
    assert near_dup_pairs_minhash(empty, threshold=0.5,
                                  num_perm=8, bands=4).count() == 0
    assert simhash_near_dup_pairs(empty).count() == 0
    assert exact_dedup_keep_min(empty).count() == 0


def test_greedy_and_cc_on_empty_pairs(ray_session):
    from dedupe_api_ray.stages.clustering import (connected_components,
                                                  greedy_matching)

    pairs = ray.data.from_arrow(pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "score": pa.array([], pa.float64())}))
    assert greedy_matching(pairs, threshold=0.5).count() == 0
    edges = ray.data.from_arrow(pa.table({
        "u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}))
    assert connected_components(edges).count() == 0


def test_partition_empty_dataset(ray_session):
    """partition() on a ZERO-record dataset must not crash (the
    materialized collapse join loses its schema and `.base_schema`
    raised AttributeError — now guarded) and returns 0 rows.  Ray 2.49
    cannot carry a TYPED empty dataset (from_arrow / from_pandas of a
    typed empty table drop the schema again on to_pandas), so column
    presence is not asserted on the empty frame."""
    from dedupe_api_ray.pipelines.dedupe import partition

    for collapse in (True, False):
        em = partition(_docs([]), _model(), threshold=0.5,
                       scorer_concurrency=(1, 2), exact_collapse=collapse)
        df = em.to_pandas()
        assert len(df) == 0
        assert set(df.columns) in (
            set(), {"record_id", "cluster_id", "confidence"})


def test_simhash_featureless_docs_not_paired(ray_session):
    """Blank/whitespace-only docs (signature 0) are skipped before
    chunk blocking — no hamming-0 all-pairs blowup among them."""
    from dedupe_api_ray.extras.dedup import simhash_near_dup_pairs

    texts = ["", "   ", None, "\t\n", "real content words here",
             "real content words here too"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    got = simhash_near_dup_pairs(ray.data.from_arrow(tbl)).to_pandas()
    featureless = {0, 1, 2, 3}
    ids = (set(got["id_a"]) | set(got["id_b"])) if len(got) else set()
    assert not (ids & featureless)
