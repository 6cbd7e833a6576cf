"""Vectorized blocking emission (blocking.vectorized) is byte-identical
to the scalar ``model._record_keys`` path — per predicate and at the
Fingerprinter / blocking-map level (VERDICT r4 next-round item 1)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from dedupe_api_ray.blocking.vectorized import (VECTOR_EMITTERS,
                                                can_vectorize, emit_spec)
from dedupe_api_ray.functions.text import normalize_array, tokenize_array
from dedupe_api_ray.model import FieldDef, Model, PredicateSpec, _record_keys

TRICKY = [
    "hello world", None, "", "the quick brown fox the quick",
    "don't stop 007 me now 007", "123abc 0042 x123y",
    "héllo wörld ünïcode", "a|b c|d", "single", "0",
    "000 12 000012", "a a a b", "ab",
    "98765432109876543210 overflow wraps int64",
    "9 8 9 8 99", "_under _score_", "'quoted' 'quoted'",
    "multi  space   runs", "ünïcode 42 ünïcode",
]


def _batch(vals):
    col = pa.array(vals, pa.string())
    return pa.table({
        "record_id": pa.array(range(len(vals)), pa.int64()),
        "f": col, "f__tokens": tokenize_array(col)})


def _scalar_keysets(spec, vals):
    toks = tokenize_array(pa.array(vals, pa.string())).to_pylist()
    return [
        _record_keys(spec, {"f": v, "f__tokens": t})
        for v, t in zip(vals, toks)]


@pytest.mark.parametrize("name", sorted(VECTOR_EMITTERS))
def test_simple_predicate_matches_scalar(name):
    spec = PredicateSpec("simple", "f", name)
    assert can_vectorize(spec)
    batch = _batch(TRICKY)
    keys, rows = emit_spec(spec, batch, {})
    seen: dict[int, list[str]] = {}
    for k, r in zip(keys.to_pylist(), rows.tolist()):
        seen.setdefault(r, []).append(k)
    for r, want in enumerate(_scalar_keysets(spec, TRICKY)):
        got = seen.get(r, [])
        assert len(got) == len(set(got)), (name, r, got)  # set semantics
        assert set(got) == want, (name, r, TRICKY[r])
    assert (np.diff(rows) >= 0).all()  # row-sorted contract


def test_compound_matches_scalar():
    spec = PredicateSpec(
        "compound", "f",
        parts=(("commonIntegerPredicate", "f"),
               ("firstTokenPredicate", "f")))
    batch = _batch(TRICKY)
    keys, rows = emit_spec(spec, batch, {})
    seen: dict[int, set[str]] = {}
    for k, r in zip(keys.to_pylist(), rows.tolist()):
        seen.setdefault(r, set()).add(k)
    for r, want in enumerate(_scalar_keysets(spec, TRICKY)):
        assert seen.get(r, set()) == want, (r, TRICKY[r])


def test_randomized_equivalence():
    rng = np.random.default_rng(7)
    alphabet = list("ab c01'|é_")
    vals = ["".join(rng.choice(alphabet, size=rng.integers(0, 30)))
            for _ in range(300)] + [None] * 10
    vals = [normalize_array(pa.array([v], pa.string()))[0].as_py()
            if v is not None else None for v in vals]
    batch = _batch(vals)
    for name in sorted(VECTOR_EMITTERS):
        spec = PredicateSpec("simple", "f", name)
        keys, rows = emit_spec(spec, batch, {})
        seen: dict[int, set[str]] = {}
        for k, r in zip(keys.to_pylist(), rows.tolist()):
            seen.setdefault(r, set()).add(k)
        for r, want in enumerate(_scalar_keysets(spec, vals)):
            assert seen.get(r, set()) == want, (name, r, vals[r])


def test_fingerprinter_blocking_map_multiset(ray_session):
    """End to end: a model mixing vectorized and scalar-fallback specs
    emits EXACTLY the blocking map the all-scalar path produced."""
    from dedupe_api_ray.stages.blocking import fingerprint_records

    vals = TRICKY * 10
    n = len(vals)
    model = Model(
        field_defs=[FieldDef("f", "Text")],
        predicates=[
            PredicateSpec("simple", "f", "firstTokenPredicate"),
            PredicateSpec("simple", "f", "fingerprint"),
            PredicateSpec("simple", "f", "suffixArrayPredicate"),  # scalar
            PredicateSpec("compound", "f",
                          parts=(("commonIntegerPredicate", "f"),
                                 ("wholeFieldPredicate", "f"))),
        ],
        weights=np.array([0.0]), bias=0.0)
    col = pa.array(vals, pa.string())
    ds = ray.data.from_arrow(pa.table({
        "record_id": pa.array(range(n), pa.int64()),
        "f": col, "f__tokens": tokenize_array(col)}))
    got = fingerprint_records(ds, model).to_pandas()
    got_rows = sorted(zip(got["block_key"], got["record_id"]))

    toks = tokenize_array(col).to_pylist()
    want_rows = []
    for r in range(n):
        rec = {"f": vals[r], "f__tokens": toks[r]}
        for i, spec in enumerate(model.predicates):
            for k in _record_keys(spec, rec):
                want_rows.append((f"{i}:{k}", r))
    assert got_rows == sorted(want_rows)
