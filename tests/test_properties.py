"""Property-based tests (hypothesis) over the pure kernels and
parsers — no Ray session needed.

These pin the algebraic invariants the distributed stages rely on:
symmetry and boundedness of every distance kernel, batch==scalar
agreement on arbitrary inputs (the vectorized paths must be
bit-faithful to their scalar definitions), metric axioms for
levenshtein, and decode(encode(x)) == x for the clean-room media
containers.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dedupe_api_ray.blocking.levenshtein import levenshtein
from dedupe_api_ray.functions.kernels import (cosine_similarity,
                                              cosine_similarity_batch,
                                              jaccard, jaccard_batch,
                                              normalized_affine_gap,
                                              normalized_affine_gap_batch,
                                              price_distance)

short_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x024F),
    max_size=24)
token = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
token_list = st.lists(token, max_size=12)


@given(short_text, short_text)
@settings(max_examples=200, deadline=None)
def test_affine_gap_symmetric_bounded_and_batch_faithful(a, b):
    d1 = normalized_affine_gap(a, b)
    d2 = normalized_affine_gap(b, a)
    if np.isnan(d1):
        assert np.isnan(d2)              # missing is missing both ways
    else:
        assert abs(d1 - d2) < 1e-12      # symmetric
        # reference constants: matchWeight=1, mismatchWeight=11 →
        # normalized distance lives in [0, 5.5], NOT [0, 1]
        assert 0.0 <= d1 <= 5.5 + 1e-12
    got = normalized_affine_gap_batch([a], [b])[0]
    if np.isnan(d1):
        assert np.isnan(got)
    else:
        assert abs(got - d1) < 1e-9      # vectorized == scalar DP


@given(short_text)
@settings(max_examples=100, deadline=None)
def test_affine_gap_identity(a):
    """Reference semantics: identical non-empty strings score the
    matchWeight=1 per char → normalized 0.5, the kernel's floor."""
    d = normalized_affine_gap(a, a)
    if a.strip():
        assert abs(d - 0.5) < 1e-12


@given(token_list, token_list)
@settings(max_examples=200, deadline=None)
def test_jaccard_bounds_symmetry_batch(a, b):
    j = jaccard(set(a), set(b))
    if np.isnan(j):                      # empty side = missing data
        assert not set(a) or not set(b)
        assert np.isnan(jaccard(set(b), set(a)))
        return
    assert 0.0 <= j <= 1.0
    assert j == jaccard(set(b), set(a))
    assert abs(jaccard_batch([a], [b])[0] - j) < 1e-12
    if set(a) and set(a) == set(b):
        assert j == 1.0


@given(token_list, token_list)
@settings(max_examples=200, deadline=None)
def test_cosine_bounds_symmetry_batch(a, b):
    c = cosine_similarity(a, b)
    if np.isnan(c):
        assert not a or not b
        return
    assert -1e-12 <= c <= 1.0 + 1e-12
    assert abs(c - cosine_similarity(b, a)) < 1e-12
    assert abs(cosine_similarity_batch([a], [b])[0] - c) < 1e-12


@given(st.text(alphabet="abcde", max_size=10),
       st.text(alphabet="abcde", max_size=10),
       st.text(alphabet="abcde", max_size=10))
@settings(max_examples=200, deadline=None)
def test_levenshtein_metric_axioms(a, b, c):
    dab = levenshtein(a, b)
    assert dab == levenshtein(b, a)                       # symmetry
    assert (dab == 0) == (a == b)                         # identity
    assert dab <= levenshtein(a, c) + levenshtein(c, b)   # triangle
    assert dab <= max(len(a), len(b))
    assert dab >= abs(len(a) - len(b))


@given(st.text(alphabet="ab", min_size=0, max_size=12),
       st.text(alphabet="ab", min_size=0, max_size=12),
       st.integers(min_value=0, max_value=4))
@settings(max_examples=200, deadline=None)
def test_levenshtein_cap_consistent(a, b, cap):
    """The capped early-exit path must agree with the exact distance
    whenever the true distance is within the cap."""
    exact = levenshtein(a, b)
    capped = levenshtein(a, b, cap=cap)
    if exact <= cap:
        assert capped == exact
    else:
        assert capped > cap


@given(st.floats(min_value=0, max_value=1e9, allow_nan=False),
       st.floats(min_value=0, max_value=1e9, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_price_distance_symmetric_nonneg(a, b):
    d = price_distance(a, b)
    if np.isnan(d):
        assert a <= 0 or b <= 0
        return
    assert d >= 0
    assert abs(d - price_distance(b, a)) < 1e-12


@given(st.integers(min_value=1, max_value=24),
       st.integers(min_value=1, max_value=24),
       st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_media_roundtrips(h, w, seed):
    from dedupe_api_ray.extras.multimodal import (decode_audio,
                                                  decode_image,
                                                  encode_bmp, encode_pgm,
                                                  encode_ppm, encode_wav)
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    assert np.array_equal(decode_image(encode_ppm(img)), img)
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    assert np.array_equal(decode_image(encode_pgm(img[:, :, 0])),
                          img[:, :, 0])
    x = rng.uniform(-1, 1, size=h * w)
    got, sr = decode_audio(encode_wav(x, 8000))
    assert sr == 8000 and len(got) == len(x)
    # 16-bit quantization + the 32767/32768 encode/decode scale step
    assert np.abs(got - np.clip(x, -1, 1)).max() < 2.0 / 32768


@settings(max_examples=200, deadline=None)
@given(st.lists(st.one_of(
    st.floats(allow_nan=False, allow_infinity=True, width=64),
    st.just(0.0), st.just(-0.0)), min_size=1, max_size=50))
def test_quantile_key_transform_order_preserving_floats(vals):
    from dedupe_api_ray.stages.quantiles import _from_key, _to_keys

    a = np.array(vals, dtype=np.float64)
    k = _to_keys(a)
    # order-preserving: sorting keys sorts values (stable, incl. ±inf
    # and -0.0/0.0 which are EQUAL as floats but distinct bit patterns:
    # compare the sorted VALUES, not the permutation)
    np.testing.assert_array_equal(np.sort(a), a[np.argsort(k)])
    # bijective: every key round-trips to its exact value bit pattern
    for v, kk in zip(a, k):
        rt = _from_key(int(kk), True)
        assert (rt == v) or (v == 0.0 and rt == 0.0)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                min_size=1, max_size=50))
def test_quantile_key_transform_order_preserving_ints(vals):
    from dedupe_api_ray.stages.quantiles import _from_key, _to_keys

    a = np.array(vals, dtype=np.int64)
    k = _to_keys(a)
    np.testing.assert_array_equal(np.sort(a), a[np.argsort(k)])
    for v, kk in zip(a, k):
        assert _from_key(int(kk), False) == int(v)
