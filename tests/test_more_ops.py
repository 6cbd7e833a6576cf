"""G3 greedy matching, P22 Levenshtein canopy/search, dedupe_canon,
classifier swap, sampling."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from dedupe_api_ray.model import FieldDef, Model, PredicateSpec


def test_levenshtein_scalar():
    from dedupe_api_ray.blocking.levenshtein import levenshtein

    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("", "abc") == 3
    assert levenshtein("abcdef", "xyz", cap=2) > 2


def test_levenshtein_canopy_and_search(ray_session):
    from dedupe_api_ray.blocking.levenshtein import (levenshtein_canopy_keys,
                                                     levenshtein_search_keys)

    vals = ["smith", "smyth", "smithe", "jones", "jonez", "wilson"]
    tbl = pa.table({"record_id": pa.array(range(6), pa.int64()),
                    "name": pa.array(vals)})
    ds = ray.data.from_arrow(tbl).materialize()
    ck = levenshtein_canopy_keys(ds, "name", distance=1,
                                 id_col="record_id").to_pandas()
    canopy = dict(zip(ck["record_id"], ck["block_key"]))
    # smith(0) sweeps first: smyth(1), smithe(2) within distance 1
    assert canopy[0] == canopy[1] == canopy[2] == "lev:0"
    assert canopy[3] == canopy[4] == "lev:3"
    assert canopy[5] == "lev:5"

    sk = levenshtein_search_keys(ds, ds, "name", distance=1,
                                 id_col="record_id").to_pandas()
    got = {}
    for rid, key in zip(sk["record_id"], sk["block_key"]):
        got.setdefault(rid, set()).add(int(key.split(":")[1]))
    assert got[1] == {0, 1}  # smyth ↔ smith (smithe is distance 2)
    assert got[2] == {0, 2}
    assert got[5] == {5}


def test_greedy_matching(ray_session):
    from dedupe_api_ray.stages.clustering import greedy_matching

    # two components; in the first, (1,2) beats (2,3); 3 left unmatched
    tbl = pa.table({
        "id_a": pa.array([1, 2, 10], pa.int64()),
        "id_b": pa.array([2, 3, 11], pa.int64()),
        "score": pa.array([0.9, 0.8, 0.7], pa.float32()),
    })
    out = greedy_matching(ray.data.from_arrow(tbl), threshold=0.5).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    assert got == {(1, 2), (10, 11)}


def test_register_variable_extension():
    """§2.11: a user-registered variable type works end-to-end —
    FieldDef(type=name), feature kernel in distances(), predicates
    learnable for that kind."""
    from dedupe_api_ray.blocking.predicates import predicates_for_kind
    from dedupe_api_ray.model import (VARIABLE_REGISTRY, DataModel, FieldDef,
                                      register_variable)

    def year_gap(a, b):
        return 1.0 / (1.0 + abs(int(a) - int(b)))

    def decade_key(v):
        return (str(int(v) // 10),)

    register_variable("Year", year_gap, predicates={"decadeOf": decade_key})
    try:
        fd = FieldDef("founded", "Year")
        dm = DataModel([fd])
        x = dm.distances({"founded": [1999, 2000]},
                         {"founded": [2001, 2000]})
        assert x[0, 0] == 1.0 / 3.0 and x[1, 0] == 1.0
        assert "decadeOf" in predicates_for_kind("Year")
    finally:
        VARIABLE_REGISTRY.pop("Year", None)


def test_classifier_swap():
    class Stub:
        def predict_proba(self, x):
            return np.column_stack([1 - x[:, 0], x[:, 0]])

    m = Model(field_defs=[FieldDef("text", "Text")],
              predicates=[], weights=np.array([0.0]), bias=0.0,
              classifier=Stub())
    x = np.array([[0.25], [0.75]])
    assert np.allclose(m.predict_proba(x), [0.25, 0.75])


def test_sample_records(ray_session):
    from dedupe_api_ray.model import sample_records

    tbl = pa.table({"record_id": pa.array(range(100), pa.int64()),
                    "text": pa.array([f"doc {i}" for i in range(100)])})
    ds = ray.data.from_arrow(tbl)
    s1 = sample_records(ds, 20, seed=7)
    s2 = sample_records(ds, 20, seed=7)
    assert len(s1) <= 20 and len(s1) > 0
    assert s1.keys() == s2.keys()  # deterministic under a fixed seed
    assert all("text" in v for v in s1.values())


def test_dedupe_canon_two_pass(ray_session, tabular_fixture):
    from dedupe_api_ray.model import train_model
    from dedupe_api_ray.pipelines.dedupe import dedupe_canon, partition

    fields = [FieldDef("name", "String"), FieldDef("address", "String"),
              FieldDef("zip", "Exact"),
              FieldDef("phone", "String", has_missing=True)]
    tbl = tabular_fixture["records"]
    cols = tbl.to_pydict()
    records = {rid: {k: cols[k][i] for k in ("name", "address", "zip", "phone")}
               for i, rid in enumerate(cols["record_id"])}
    lp = tabular_fixture["labeled_pairs"].to_pydict()
    labeled = list(zip(lp["id_a"], lp["id_b"], lp["label"]))
    model = train_model(records, labeled, fields)

    ds = ray.data.from_arrow(tbl)
    final, canon = dedupe_canon(ds, model, threshold=0.5,
                                scorer_concurrency=(1, 2))
    fdf = final.to_pandas()
    assert len(fdf) == len(records)  # every record assigned
    # second pass can only merge clusters, never split them
    em1 = partition(ray.data.from_arrow(tbl), model, threshold=0.5,
                    scorer_concurrency=(1, 2)).to_pandas()
    n1 = em1["cluster_id"].nunique()
    n2 = fdf["cluster_id"].nunique()
    assert n2 <= n1
    cdf = canon.to_pandas()
    assert set(cdf.columns) >= {"record_id", "name", "address"}


def test_sessionize_gap_semantics_and_parallel_invariance(ray_session):
    """Gap STRICTLY greater than the threshold splits sessions; output
    is identical across partition counts (users never split)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from dedupe_api_ray.extras.sessions import sessionize

    base = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(60_000_000, "us")  # one minute
    rows = [
        # user 1: gaps 30min (same session: not > 30), then 31min (new)
        (1, base, 1, 1.0),
        (2, base + 30 * m, 1, 2.0),
        (3, base + 61 * m, 1, 4.0),
        # user 2: single event
        (4, base + 5 * m, 2, 10.0),
        # user 3: two bursts
        (5, base, 3, 1.5),
        (6, base + 1 * m, 3, 1.5),
        (7, base + 200 * m, 3, 7.0),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "value": pa.array([r[3] for r in rows], pa.float64())})

    def run(nparts):
        out = sessionize(ray.data.from_arrow(tbl), gap_minutes=30.0,
                         num_partitions=nparts).to_pandas()
        return out.sort_values(["user_id", "session_id"]) \
            .reset_index(drop=True)

    got = run(2)
    want = pd.DataFrame({
        "user_id": [1, 1, 2, 3, 3],
        "session_id": [1, 2, 1, 1, 2],
        "n_events": [2, 1, 1, 2, 1],
        "sum_value_cents": [300, 400, 1000, 300, 700],
    })
    for col in want.columns:
        assert got[col].tolist() == want[col].tolist(), col
    assert got["session_start"].tolist() == [
        pd.Timestamp(base), pd.Timestamp(base + 61 * m),
        pd.Timestamp(base + 5 * m), pd.Timestamp(base),
        pd.Timestamp(base + 200 * m)]
    pd.testing.assert_frame_equal(got, run(7))
