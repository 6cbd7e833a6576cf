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
