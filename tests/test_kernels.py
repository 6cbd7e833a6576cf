"""Distance-kernel unit tests: hand-computed values + scalar-vs-batch
differential checks (SURVEY.md §5.1)."""

import math

import numpy as np
import pytest

from dedupe_api_ray.functions import kernels


def test_affine_gap_identical_is_half_after_norm():
    # reference quirk †: identical strings → matchWeight*len / 2len = .5
    assert kernels.normalized_affine_gap("spago", "spago") == pytest.approx(0.5)


def test_affine_gap_hand_values():
    # single substitution in a 3-char string:
    # DP: best alignment = 2 matches + 1 mismatch = 1+1+11 = 13
    assert kernels.affine_gap("abc", "abd") == pytest.approx(13.0)
    # leading insertion of one char: gap(10) + space(7) + 2 matches = 19
    assert kernels.affine_gap("ab", "xab") == pytest.approx(19.0)
    # trailing insertion takes the abbreviation discount: match a (1) +
    # mismatch x/b (11) + discounted trailing insert (10+7)*0.125
    assert kernels.affine_gap("ab", "axb") == pytest.approx(14.125)
    # abbreviation discount: trailing gap beyond shorter string is
    # cheaper than an internal gap of the same length
    internal = kernels.affine_gap("abxxcd", "abcd")
    trailing = kernels.affine_gap("abcdxx", "abcd")
    assert trailing < internal


def test_affine_gap_symmetry():
    for a, b in [("spago", "spago los angeles"), ("main st", "main street"),
                 ("12 oak ave", "21 oak ave"), ("x", "yz")]:
        assert kernels.affine_gap(a, b) == pytest.approx(kernels.affine_gap(b, a))


def test_affine_gap_batch_matches_scalar():
    pairs = [
        ("spago", "spago los angeles"),
        ("main st", "main street"),
        ("anna smith", "anna smth"),
        ("hello world", "world hello"),
        ("a", "a"),
        ("abc", "xyz"),
        ("the quick brown fox", "the quick brown fox jumps"),
        ("1234 elm st", "1235 elm st"),
    ]
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    batch = kernels.normalized_affine_gap_batch(a, b)
    for i, (x, y) in enumerate(pairs):
        assert batch[i] == pytest.approx(kernels.normalized_affine_gap(x, y),
                                         abs=1e-9), (x, y)


def test_affine_gap_batch_missing():
    out = kernels.normalized_affine_gap_batch(["a", None, ""], ["b", "c", "d"])
    assert not math.isnan(out[0])
    assert math.isnan(out[1])
    assert math.isnan(out[2])


def test_cosine():
    assert kernels.cosine_similarity(["a", "b"], ["a", "b"]) == pytest.approx(1.0)
    assert kernels.cosine_similarity(["a"], ["b"]) == pytest.approx(0.0)
    # hand: ta={a:1,b:1}, tb={a:1}; cos = 1/(sqrt(2)*1)
    assert kernels.cosine_similarity(["a", "b"], ["a"]) == pytest.approx(1 / math.sqrt(2))
    assert math.isnan(kernels.cosine_similarity([], ["a"]))
    # idf weighting: token 'a' downweighted
    idf = {"a": 0.5, "b": 2.0}
    got = kernels.cosine_similarity(["a", "b"], ["a"], idf)
    # va=(.5, 2), vb=(.5, 0): dot=.25, na=sqrt(.25+4), nb=.5
    assert got == pytest.approx(0.25 / (math.sqrt(4.25) * 0.5))


def test_jaccard():
    assert kernels.jaccard(["a", "b"], ["b", "c"]) == pytest.approx(1 / 3)
    assert kernels.jaccard(["a"], ["a"]) == pytest.approx(1.0)
    assert math.isnan(kernels.jaccard(None, ["a"]))


def test_price_haversine_exact():
    assert kernels.price_distance(100, 1000) == pytest.approx(1.0)
    assert math.isnan(kernels.price_distance(-1, 5))
    # London → Paris ≈ 344 km
    assert kernels.haversine(51.5074, -0.1278, 48.8566, 2.3522) == pytest.approx(344, abs=2)
    out = kernels.exact_batch(np.array(["x", "y", None], dtype=object),
                              np.array(["x", "z", "w"], dtype=object))
    assert out[0] == 1.0 and out[1] == 0.0 and math.isnan(out[2])
