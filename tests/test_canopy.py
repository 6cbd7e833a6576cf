"""TF-IDF canopy blocking (P20/P21) vs the naive O(n^2) oracle."""

import pyarrow as pa
import pytest

import ray
import ray.data

from dedupe_api_ray.fixtures import pairwise_f1
from dedupe_api_ray.model import (FieldDef, Model, PredicateSpec,
                                  _normalize_record, train_model)
from dedupe_api_ray.oracle import oracle_canopy, oracle_partition


def _pages_records(tiny_corpus):
    from dedupe_api_ray.fixtures import record_id_of_url

    cols = tiny_corpus["pages"].to_pydict()
    return {record_id_of_url(u): {"text": t}
            for u, t in zip(cols["url"], cols["text"])}


def test_canopy_keys_match_oracle(ray_session, tiny_corpus):
    from dedupe_api_ray.blocking.canopy import tfidf_canopy_keys
    from dedupe_api_ray.stages.blocking import prepare_records

    records = _pages_records(tiny_corpus)
    field_defs = [FieldDef("text", "Text")]
    norm = {rid: _normalize_record(r, field_defs)
            for rid, r in records.items()}
    want = oracle_canopy(norm, "text", threshold=0.5)

    tbl = pa.table({
        "record_id": pa.array(sorted(records), pa.int64()),
        "text": pa.array([records[r]["text"] for r in sorted(records)],
                         pa.string()),
    })
    ds = prepare_records(ray.data.from_arrow(tbl), field_defs)
    got_df = tfidf_canopy_keys(ds, "text", threshold=0.5,
                               pred_tag="c").to_pandas()
    got = {rid: int(key.split(":", 1)[1])
           for rid, key in zip(got_df["record_id"], got_df["block_key"])}
    assert got == want


def test_search_keys_superset_of_canopy(ray_session, tiny_corpus):
    """P21 emits a key for EVERY indexed record within threshold; the
    canopy center must be among a record's search keys when the record
    joined that canopy (center similarity >= threshold)."""
    from dedupe_api_ray.blocking.canopy import (tfidf_canopy_keys,
                                                tfidf_search_keys)
    from dedupe_api_ray.stages.blocking import prepare_records

    records = _pages_records(tiny_corpus)
    field_defs = [FieldDef("text", "Text")]
    tbl = pa.table({
        "record_id": pa.array(sorted(records), pa.int64()),
        "text": pa.array([records[r]["text"] for r in sorted(records)],
                         pa.string()),
    })
    ds = prepare_records(ray.data.from_arrow(tbl), field_defs).materialize()
    canopy = tfidf_canopy_keys(ds, "text", threshold=0.5,
                               pred_tag="c").to_pandas()
    search = tfidf_search_keys(ds, ds, "text", threshold=0.5,
                               pred_tag="s").to_pandas()
    search_keys: dict[int, set[int]] = {}
    for rid, key in zip(search["record_id"], search["block_key"]):
        search_keys.setdefault(rid, set()).add(int(key.split(":", 1)[1]))
    for rid, key in zip(canopy["record_id"], canopy["block_key"]):
        center = int(key.split(":", 1)[1])
        assert center in search_keys.get(rid, set()), (rid, center)


def test_partition_with_canopy_matches_oracle(ray_session, tiny_corpus):
    from dedupe_api_ray.fixtures import record_id_of_url
    from dedupe_api_ray.pipelines.dedupe import partition

    cols = tiny_corpus["pages"].to_pydict()
    records = {record_id_of_url(u): {"text": t, "url_host": u.split("/")[2]}
               for u, t in zip(cols["url"], cols["text"])}
    lp = tiny_corpus["labeled_pairs"].to_pydict()
    labeled = list(zip(lp["id_a"], lp["id_b"], lp["label"]))
    fields = [FieldDef("text", "Text"), FieldDef("url_host", "ShortString")]
    model = train_model(records, labeled, fields, max_predicates=2)
    model.predicates = model.predicates[:1] + [
        PredicateSpec("tfidf_canopy", "text", params={"threshold": 0.6})]

    tbl = pa.table({
        "record_id": pa.array(sorted(records), pa.int64()),
        "text": pa.array([records[r]["text"] for r in sorted(records)]),
        "url_host": pa.array([records[r]["url_host"] for r in sorted(records)]),
    })
    em = partition(ray.data.from_arrow(tbl), model, threshold=0.5,
                   exact_collapse=False,
                   scorer_concurrency=(1, 2)).to_pandas()
    engine_assign = dict(zip(em["record_id"], em["cluster_id"]))

    oracle_assign = oracle_partition(records, model, threshold=0.5)
    f1 = pairwise_f1(engine_assign,
                     {r: c for r, (c, _) in oracle_assign.items()})
    assert f1 >= 0.99, f"canopy partition engine-vs-oracle F1 {f1}"
