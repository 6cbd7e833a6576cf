"""JSON scalar extraction (functions/jsonx.py): fast-path semantics
vs json.loads, empty-string disambiguation, exact fallback parity."""

import json

import numpy as np
import pyarrow as pa

from dedupe_api_ray.functions.jsonx import (JsonParseRows,
                                            extract_json_int,
                                            extract_json_string)

DOCS = ['{"k": 87, "s": "hi"}', '{"k": -3}', '{"s": ""}',
        '{"k": "12"}', '{"k": true}', '{"k": null}', '{"x": 1}',
        None, 'not json at all', '{"s": "with, comma"}',
        '{ "k" : 5 }']


def test_extract_json_int_matches_json_loads():
    col = pa.chunked_array([pa.array(DOCS, pa.string())])
    got = extract_json_int(col, "k").to_pylist()
    want = []
    for d in DOCS:
        try:
            v = json.loads(d).get("k") if d else None
        except ValueError:
            v = None
        want.append(v if isinstance(v, int) and not isinstance(v, bool)
                    else None)
    assert got == want  # quoted "12", true, null, missing → all null


def test_extract_json_string_semantics():
    col = pa.array(DOCS, pa.string())
    got = extract_json_string(col, "s").to_pylist()
    # row 2 has a REAL empty string value — must come back '' not null
    assert got[0] == "hi" and got[2] == "" and got[9] == "with, comma"
    assert got[1] is None and got[7] is None
    # numbers/booleans come back as literal text; a JSON null value
    # yields SQL null, like a missing key (DuckDB json_extract_string
    # semantics — and the JsonParseRows fallback agrees)
    kk = extract_json_string(col, "k").to_pylist()
    assert kk[0] == "87" and kk[4] == "true" and kk[5] is None


def test_json_parse_rows_fallback_matches_fast_path():
    t = pa.table({"props": pa.array(DOCS, pa.string()),
                  "rid": pa.array(range(len(DOCS)), pa.int64())})
    out = JsonParseRows("props", ["k", "s"])(t)
    fast_s = extract_json_string(t["props"], "s").to_pylist()
    assert out["props_s"].to_pylist() == fast_s
    # nested payloads: fallback handles what the fast path excludes
    t2 = pa.table({"props": pa.array(['{"k": {"a": [1, 2]}}']),
                   "rid": pa.array([0], pa.int64())})
    out2 = JsonParseRows("props", ["k"])(t2)
    assert out2["props_k"].to_pylist() == ['{"a":[1,2]}']


def test_jsonx_hardening():
    # valid non-object JSON rows must not crash the fallback
    t = pa.table({"props": pa.array(["[1,2]", "5", '"str"', "null",
                                     '{"k": 7}']),
                  "rid": pa.array(range(5), pa.int64())})
    out = JsonParseRows("props", ["k"])(t)
    assert out["props_k"].to_pylist() == [None, None, None, None, "7"]
    # a >18-digit integer nulls out instead of killing the batch
    big = pa.array(['{"k": 99999999999999999999}', '{"k": 42}'])
    assert extract_json_int(big, "k").to_pylist() == [None, 42]
