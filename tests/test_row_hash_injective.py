"""add_row_hash (pipelines/dedupe.py): the vectorized row encoding
must be injective on adversarial content — values containing the
\\x1f separator byte, digit-prefixed strings that could be confused
with the length prefix, null vs empty string, and boundary-shifting
splits of the same concatenation.  The sf-scale oracle checks
exact_dedup on benign fixture text; this pins the encoding itself."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dedupe_api_ray.pipelines.dedupe import add_row_hash


def _hashes(rows, fields=("a", "b")):
    t = pa.table({f: pa.array([r[i] for r in rows], pa.string())
                  for i, f in enumerate(fields)})
    out = add_row_hash(ray.data.from_arrow(t), list(fields)).to_pandas()
    return out["row_hash"].tolist()


def test_row_hash_adversarial_pairs_distinct(ray_session):
    rows = [
        ("a", "b"),
        ("ab", ""),            # concatenation equal, split differs
        ("ab", None),          # null vs empty
        ("a\x1fb", None),      # separator inside a value
        ("a\x1fb", ""),
        ("a", "\x1fb"),        # separator at a boundary
        ("a\x1f", "b"),
        ("1a", "b"),           # digit prefix vs length prefix
        ("a", "1b"),
        ("", ""),
        ("", None),
        (None, ""),
        (None, None),
        ("1", "1a"),           # len-like content
        ("11", "a"),
        ("a\x1f1\x1fb", ""),   # fake (flag, len) stream inside a value
    ]
    h = _hashes(rows)
    assert len(set(h)) == len(rows), "encoding collision on distinct rows"
    # and equal rows DO collapse
    assert _hashes([("a\x1fb", None)]) == [h[3]]


adv = st.one_of(st.none(), st.text(alphabet="ab1\x1f", max_size=4))


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(adv, adv), min_size=1, max_size=40))
def test_row_hash_fuzz_equality_iff_tuple_equality(ray_session, rows):
    h = _hashes(rows)
    groups = {}
    for r, k in zip(rows, h):
        groups.setdefault(k, set()).add(r)
    # same hash ⇔ same tuple (128-bit collisions are impossible at
    # this scale; any collision here is an encoding bug)
    for members in groups.values():
        assert len(members) == 1
    assert len(set(h)) == len(set(rows))
