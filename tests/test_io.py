"""Sources/sinks: training-pair JSON round-trip (S3), entity-map export
formats (S6), CSV ingest (S1)."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data


def test_training_file_roundtrip_trains_same_model(tmp_path, tabular_fixture):
    from dedupe_api_ray.model import FieldDef, train_model
    from dedupe_api_ray.sources import read_training, write_training

    cols = tabular_fixture["records"].to_pydict()
    records = {rid: {k: cols[k][i] for k in ("name", "address", "zip",
                                             "phone")}
               for i, rid in enumerate(cols["record_id"])}
    lp = tabular_fixture["labeled_pairs"].to_pydict()
    labeled = list(zip(lp["id_a"], lp["id_b"],
                       [bool(v) for v in lp["label"]]))

    p = str(tmp_path / "training.json")
    write_training(p, records, labeled)
    payload = json.load(open(p))
    assert set(payload) == {"match", "distinct"}  # dedupe file shape

    recs2, labeled2 = read_training(p)
    # the file groups matches before distincts (dedupe's shape) —
    # pair-set equality is the semantic round-trip property
    assert set(labeled2) == set(labeled)
    assert len(labeled2) == len(labeled)
    fields = [FieldDef("name", "String"), FieldDef("address", "String"),
              FieldDef("zip", "Exact"),
              FieldDef("phone", "String", has_missing=True)]
    m1 = train_model(records, labeled, fields, max_predicates=2)
    m2 = train_model(recs2, labeled2, fields, max_predicates=2)
    assert np.allclose(m1.weights, m2.weights)
    assert [s.pred_id for s in m1.predicates] == \
        [s.pred_id for s in m2.predicates]


def test_entity_map_export_formats(ray_session, tmp_path):
    from dedupe_api_ray.sources import write_entity_map

    em = ray.data.from_arrow(pa.table({
        "record_id": pa.array([1, 2, 3], pa.int64()),
        "cluster_id": pa.array([1, 1, 3], pa.int64()),
        "confidence": pa.array([0.9, 0.9, 1.0], pa.float64()),
    }))
    for fmt, reader in (("parquet", ray.data.read_parquet),
                        ("csv", ray.data.read_csv),
                        ("json", ray.data.read_json)):
        out = str(tmp_path / fmt)
        write_entity_map(em, out, fmt=fmt)
        assert os.path.isdir(out) and os.listdir(out)
        back = reader(out).to_pandas().sort_values("record_id")
        assert list(back["record_id"]) == [1, 2, 3]
        assert list(back["cluster_id"]) == [1, 1, 3]
    with pytest.raises(ValueError):
        write_entity_map(em, str(tmp_path / "x"), fmt="xml")


def test_csv_records_source(ray_session, tmp_path):
    from dedupe_api_ray.sources import read_records_csv

    p = str(tmp_path / "recs.csv")
    with open(p, "w") as f:
        f.write("record_id,name,extra\n1,alpha,z\n2,beta,z\n")
    ds = read_records_csv(p, columns=["record_id", "name"])
    df = ds.to_pandas()
    assert sorted(df.columns) == ["name", "record_id"]
    assert len(df) == 2
