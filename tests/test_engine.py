"""Distributed-engine tests: each Ray stage vs the pure-Python oracle,
then full partition() parity (SURVEY.md §5.3/§5.4)."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from dedupe_api_ray.fixtures import pairwise_f1
from dedupe_api_ray.model import FieldDef, train_model, _normalize_record
from dedupe_api_ray.oracle import (oracle_block_keys, oracle_pairs,
                                   oracle_partition, oracle_score_pair)

TABULAR_FIELDS = [
    FieldDef("name", "String"),
    FieldDef("address", "String"),
    FieldDef("zip", "Exact"),
    FieldDef("phone", "String", has_missing=True),
]


@pytest.fixture(scope="module")
def trained(tabular_fixture):
    tbl = tabular_fixture["records"]
    cols = tbl.to_pydict()
    records = {rid: {k: cols[k][i] for k in ("name", "address", "zip", "phone")}
               for i, rid in enumerate(cols["record_id"])}
    lp = tabular_fixture["labeled_pairs"].to_pydict()
    labeled = list(zip(lp["id_a"], lp["id_b"], lp["label"]))
    model = train_model(records, labeled, TABULAR_FIELDS)
    return records, model


def test_fingerprint_matches_oracle(ray_session, tabular_fixture, trained):
    from dedupe_api_ray.stages.blocking import (fingerprint_records,
                                                prepare_records)

    records, model = trained
    ds = ray.data.from_arrow(tabular_fixture["records"])
    prepared = prepare_records(ds, model.field_defs)
    bm = fingerprint_records(prepared, model).to_pandas()
    engine_keys = {}
    for rid, key in zip(bm["record_id"], bm["block_key"]):
        engine_keys.setdefault(rid, set()).add(key)

    norm = {rid: _normalize_record(r, model.field_defs)
            for rid, r in records.items()}
    oracle_keys = oracle_block_keys(norm, model)
    for rid in records:
        assert engine_keys.get(rid, set()) == oracle_keys[rid], rid


def test_candidate_pairs_match_oracle(ray_session, tabular_fixture, trained):
    from dedupe_api_ray.stages.blocking import (candidate_pairs,
                                                fingerprint_records,
                                                prepare_records)

    records, model = trained
    ds = ray.data.from_arrow(tabular_fixture["records"])
    prepared = prepare_records(ds, model.field_defs)
    bm = fingerprint_records(prepared, model)
    pairs = candidate_pairs(bm, max_block_size=10, hard_cap=10**9).to_pandas()
    engine_pairs = set(zip(pairs["id_a"], pairs["id_b"]))

    norm = {rid: _normalize_record(r, model.field_defs)
            for rid, r in records.items()}
    expected = oracle_pairs(oracle_block_keys(norm, model))
    assert engine_pairs == expected


def test_scores_match_oracle(ray_session, tabular_fixture, trained):
    from dedupe_api_ray.stages.blocking import prepare_records
    from dedupe_api_ray.stages.scoring import attach_payload, score_pairs

    records, model = trained
    norm = {rid: _normalize_record(r, model.field_defs)
            for rid, r in records.items()}
    sample = sorted(records)[:30]
    pair_list = [(sample[i], sample[j]) for i in range(len(sample))
                 for j in range(i + 1, min(i + 4, len(sample)))]
    pairs_ds = ray.data.from_arrow(pa.table({
        "id_a": pa.array([p[0] for p in pair_list], pa.int64()),
        "id_b": pa.array([p[1] for p in pair_list], pa.int64())}))
    prepared = prepare_records(
        ray.data.from_arrow(tabular_fixture["records"]), model.field_defs)
    scored = score_pairs(
        attach_payload(pairs_ds, prepared, model), model,
        concurrency=2).to_pandas()
    got = {(a, b): s for a, b, s in
           zip(scored["id_a"], scored["id_b"], scored["score"])}
    for a, b in pair_list:
        want = oracle_score_pair(norm[a], norm[b], model)
        assert got[(a, b)] == pytest.approx(want, abs=1e-5), (a, b)


def test_connected_components_modes(ray_session):
    from dedupe_api_ray.stages.clustering import connected_components

    # two chains + a singleton-free triangle, ids deliberately unsorted
    edges = [(5, 9), (9, 12), (100, 50), (7, 5), (200, 100), (31, 30)]
    tbl = pa.table({"u": pa.array([e[0] for e in edges], pa.int64()),
                    "v": pa.array([e[1] for e in edges], pa.int64())})
    want = {5: 5, 9: 5, 12: 5, 7: 5, 50: 50, 100: 50, 200: 50, 30: 30, 31: 30}
    for mode in ("driver", "distributed"):
        ds = ray.data.from_arrow(tbl)
        got = connected_components(ds, mode=mode).to_pandas()
        assert dict(zip(got["record_id"], got["component_id"])) == want, mode


def test_partition_matches_oracle(ray_session, tabular_fixture, trained):
    from dedupe_api_ray.pipelines.dedupe import partition

    records, model = trained
    ds = ray.data.from_arrow(tabular_fixture["records"])
    em = partition(ds, model, threshold=0.5, max_block_size=50,
                   scorer_concurrency=(1, 2)).to_pandas()
    assert len(em) == len(records)
    engine_assign = dict(zip(em["record_id"], em["cluster_id"]))

    oracle_assign = oracle_partition(records, model, threshold=0.5)
    f1 = pairwise_f1(engine_assign,
                     {r: c for r, (c, _) in oracle_assign.items()})
    assert f1 >= 0.99, f"engine-vs-oracle pairwise F1 {f1}"

    gold_cols = tabular_fixture["gold_clusters"].to_pydict()
    gold = dict(zip(gold_cols["record_id"], gold_cols["cluster_id"]))
    f1_gold = pairwise_f1(engine_assign, gold)
    assert f1_gold >= 0.9, f"engine-vs-gold pairwise F1 {f1_gold}"


def test_partition_return_stage(ray_session, tabular_fixture, trained):
    """return_stage intermediates are consistent with the full run:
    every final cluster sits inside one threshold component, and the
    components are the CC of the >=threshold scored pairs."""
    from dedupe_api_ray.pipelines.dedupe import partition

    records, model = trained
    ds = ray.data.from_arrow(tabular_fixture["records"])
    kw = dict(threshold=0.5, max_block_size=50, scorer_concurrency=(1, 2))
    scored = partition(ds, model, return_stage="scores", **kw).to_pandas()
    assert set(scored.columns) == {"id_a", "id_b", "score"}
    assert (scored["id_a"] < scored["id_b"]).all()

    comp = partition(ds, model, return_stage="components", **kw).to_pandas()
    assert len(comp) == len(records)  # every record labeled
    comp_of = dict(zip(comp["record_id"], comp["cluster_id"]))
    # component labels close over the >=0.5 edges
    for r in scored.itertuples():
        if r.score >= 0.5:
            assert comp_of[r.id_a] == comp_of[r.id_b]

    em = partition(ds, model, **kw).to_pandas()
    cl_of = dict(zip(em["record_id"], em["cluster_id"]))
    # final clustering refines the components: same cluster -> same comp
    by_cluster: dict = {}
    for rid, cid in cl_of.items():
        by_cluster.setdefault(cid, set()).add(comp_of[rid])
    assert all(len(s) == 1 for s in by_cluster.values())

    with pytest.raises(ValueError):
        partition(ds, model, return_stage="nope", **kw)
