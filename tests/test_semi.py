"""Semi/anti joins (stages/semi.py): EXISTS semantics incl. null
keys, brute-force parity, layout/parallelism invariance."""

import numpy as np
import pandas as pd
import pytest

from dedupe_api_ray.stages.semi import anti_join, semi_join


def _run(fn, left, right, **kw):
    import ray.data

    return fn(ray.data.from_pandas(left), ray.data.from_pandas(right),
              **kw).to_pandas()


def test_semi_anti_null_semantics(ray_session):
    left = pd.DataFrame({"k": [1, 2, 3, None, 2], "lid": [0, 1, 2, 3, 4]})
    right = pd.DataFrame({"k": [2.0, 2.0, 4.0, None], "junk": list("abcd")})
    s = _run(semi_join, left, right, left_on="k")
    a = _run(anti_join, left, right, left_on="k")
    assert sorted(s["lid"]) == [1, 4]          # null never matches
    assert sorted(a["lid"]) == [0, 2, 3]       # null kept by NOT EXISTS
    assert list(s.columns) == ["k", "lid"]     # no right payload
    assert len(s) + len(a) == len(left)        # exact partition of left


def test_semi_anti_bruteforce_and_invariance(ray_session):
    import ray.data

    rng = np.random.default_rng(9)
    left = pd.DataFrame({"k": rng.integers(0, 50, 600),
                         "lid": np.arange(600)})
    right = pd.DataFrame({"k": rng.integers(25, 75, 200)})
    present = set(right["k"])
    want_semi = sorted(left["lid"][left["k"].isin(present)])
    prev = None
    for blocks, parts in ((1, 3), (8, 11)):
        lds = ray.data.from_pandas(
            [d for _, d in left.groupby(left.index % blocks)]) \
            if blocks > 1 else ray.data.from_pandas(left)
        s = semi_join(lds, ray.data.from_pandas(right), left_on="k",
                      num_partitions=parts).to_pandas()
        a = anti_join(lds, ray.data.from_pandas(right), left_on="k",
                      num_partitions=parts).to_pandas()
        assert sorted(s["lid"]) == want_semi
        assert sorted(a["lid"]) == sorted(
            set(left["lid"]) - set(want_semi))
        if prev is not None:
            assert prev == sorted(s["lid"])
        prev = sorted(s["lid"])


def test_semi_string_keys_distinct_names(ray_session):
    left = pd.DataFrame({"host": ["a.com", "b.com", "c.com"],
                         "lid": [0, 1, 2]})
    right = pd.DataFrame({"domain": ["b.com", "b.com", "z.com"]})
    s = _run(semi_join, left, right, left_on="host", right_on="domain")
    assert sorted(s["lid"]) == [1]


def test_semi_validation(ray_session):
    import ray.data

    left = pd.DataFrame({"k": [1]})
    right = pd.DataFrame({"x": [1]})
    with pytest.raises(ValueError, match="lacks column"):
        semi_join(ray.data.from_pandas(left),
                  ray.data.from_pandas(right), left_on="k")


def test_bloom_prefilter_equivalence(ray_session):
    """Bloom-prefiltered semi/anti must equal the exact paths — at a
    realistic bitmap size AND at a pathologically tiny one (64 bits)
    where false positives are common and must be resolved by the
    exact kernel."""
    rng = np.random.default_rng(21)
    left = pd.DataFrame({"k": rng.integers(0, 500, 800).astype(float),
                         "lid": np.arange(800)})
    left.loc[::97, "k"] = None  # null keys: dropped by semi, kept by anti
    right = pd.DataFrame({"k": rng.integers(400, 900, 150)})
    base_s = sorted(_run(semi_join, left, right, left_on="k")["lid"])
    base_a = sorted(_run(anti_join, left, right, left_on="k")["lid"])
    for bits in (1 << 23, 64):
        s = _run(semi_join, left, right, left_on="k",
                 prefilter="bloom", bloom_bits=bits)
        a = _run(anti_join, left, right, left_on="k",
                 prefilter="bloom", bloom_bits=bits)
        assert sorted(s["lid"]) == base_s
        assert sorted(a["lid"]) == base_a
        assert list(s.columns) == list(a.columns) == ["k", "lid"]


def test_bloom_prefilter_guard(ray_session):
    left = pd.DataFrame({"k": [1], "lid": [0]})
    with pytest.raises(ValueError, match="prefilter"):
        _run(semi_join, left, left, left_on="k", prefilter="cuckoo")
