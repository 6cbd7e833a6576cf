"""Distance / similarity kernels used to build the pairwise feature
vector (SURVEY.md §2.9, K1–K10).

Reference semantics (†, SURVEY.md §0):
- K1 normalizedAffineGapDistance — affinegap:affinegap.pyx † with the
  reference constants matchWeight=1, mismatchWeight=11, gapWeight=10,
  spaceWeight=7, abbreviation_scale=.125.  Note the quirk that
  identical strings score 0.5 after normalization (distance
  matchWeight*len / (len+len)).
- K2 cosine TF(-IDF) similarity — simplecosine:simplecosine † (Text
  fields; IDF weights from a corpus when provided, else plain TF).
- K3 Jaccard / Set overlap — dedupe:dedupe/variables/set.py †.
- K4 exact — dedupe:dedupe/variables/exact.py †.
- K5 price — dedupe:dedupe/variables/price.py † (relative |log10
  ratio| style difference).
- K6 haversine — dedupe:dedupe/variables/latlong.py †.

Each kernel has a scalar form (used by the vendored mini-oracle and
unit tests) and a batched numpy form (used inside the PairScorer actor
pool).  Missing values (None/empty) yield NaN; the DataModel replaces
NaN with 0 and raises a companion missing-indicator feature
(dedupe:dedupe/datamodel.py †, K10).
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

# affinegap reference constants †
MATCH_W = 1.0
MISMATCH_W = 11.0
GAP_W = 10.0
SPACE_W = 7.0
ABBR_SCALE = 0.125

# Both engine and oracle truncate affine-gap inputs to this many chars
# (documented engine-wide rule; the reference has no cap † but applies
# affine gap only to String/ShortString fields, which are short — the
# cap bounds the O(L^2) DP at web scale).
MAX_AFFINE_LEN = 256


def affine_gap(a: str, b: str) -> float:
    """Scalar affine-gap alignment distance (affinegap.pyx † port of
    the public algorithm; Gotoh DP with the reference's abbreviation
    discount for gaps past the end of the shorter string)."""
    a, b = a[:MAX_AFFINE_LEN], b[:MAX_AFFINE_LEN]
    if a == b:
        return MATCH_W * len(a)
    s1, s2 = (a, b) if len(a) >= len(b) else (b, a)
    l1, l2 = len(s1), len(s2)
    inf = math.inf
    v_cur = [0.0] + [GAP_W + SPACE_W * j for j in range(1, l1 + 1)]
    d = [inf] * (l1 + 1)
    for i in range(1, l2 + 1):
        c2 = s2[i - 1]
        v_prev = v_cur[:]
        v_cur[0] = GAP_W + SPACE_W * i
        ins = inf
        for j in range(1, l1 + 1):
            if j <= l2:
                ins = min(ins, v_cur[j - 1] + GAP_W) + SPACE_W
            else:  # abbreviation discount past the shorter string's end
                ins = min(ins, v_cur[j - 1] + GAP_W * ABBR_SCALE) + SPACE_W * ABBR_SCALE
            d[j] = min(d[j], v_prev[j] + GAP_W) + SPACE_W
            m = v_prev[j - 1] + (MATCH_W if s1[j - 1] == c2 else MISMATCH_W)
            v_cur[j] = min(ins, d[j], m)
    return v_cur[l1]


def normalized_affine_gap(a: str | None, b: str | None) -> float:
    """K1: affine gap / (len(a)+len(b)); NaN on missing/empty."""
    if not a or not b:
        return float("nan")
    a, b = a[:MAX_AFFINE_LEN], b[:MAX_AFFINE_LEN]
    return affine_gap(a, b) / (len(a) + len(b))


def _encode_padded(strings: list[str], max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """Char-code matrix (n, max_len) padded with -1, plus lengths."""
    n = len(strings)
    lens = np.fromiter((len(s) for s in strings), dtype=np.int64, count=n)
    out = np.full((n, max_len), -1, dtype=np.int32)
    for i, s in enumerate(strings):
        if s:
            out[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    return out, lens


def normalized_affine_gap_batch(a: np.ndarray | list, b: np.ndarray | list) -> np.ndarray:
    """Vectorized-over-pairs K1, memoized over unique value pairs.

    Candidate pairs repeat (a, b) value combinations massively on web
    data (url_host: ~10^4 distinct hosts across 10^5-10^6 pairs per
    batch), so both sides are factorized and the DP runs once per
    UNIQUE value pair, scattered back by inverse index.  Scalar
    results are unchanged — the same strings reach the same DP — and
    when every pair is distinct the overhead is one int64 sort.
    """
    n = len(a)
    if n > 64:
        import pandas as pd
        ca, _ = pd.factorize(np.asarray(a, dtype=object))
        cb, ub = pd.factorize(np.asarray(b, dtype=object))
        # +1 shifts the -1 null sentinel into a valid code; nulls then
        # dedup like any value and the scalar path below yields NaN
        comp = (ca.astype(np.int64) + 1) * (len(ub) + 2) + (cb + 1)
        uniq, first, inv = np.unique(comp, return_index=True,
                                     return_inverse=True)
        if len(uniq) < n:
            av = a[first] if isinstance(a, np.ndarray) else [a[i] for i in first]
            bv = b[first] if isinstance(b, np.ndarray) else [b[i] for i in first]
            return _nag_pairs(av, bv)[inv]
    return _nag_pairs(a, b)


def _nag_pairs(a: np.ndarray | list, b: np.ndarray | list) -> np.ndarray:
    """Pair-vectorized affine-gap core (no dedup).

    The DP is inherently sequential in (i, j) (the insertion-cost
    running min depends on V_current[j-1]), so we vectorize across the
    PAIR dimension instead: all pairs advance through a shared (i, j)
    loop on padded char-code matrices.  Pairs are bucketed by length so
    short pairs don't pay long pairs' O(L1*L2) loop cost.
    """
    n = len(a)
    out = np.full(n, np.nan, dtype=np.float64)
    todo: list[int] = []
    s1l: list[str] = []
    s2l: list[str] = []
    for i in range(n):
        x, y = a[i], b[i]
        if not x or not y or x is None or y is None:
            continue
        x, y = x[:MAX_AFFINE_LEN], y[:MAX_AFFINE_LEN]
        if x == y:
            out[i] = 0.5  # match_w*len / 2len with reference constants
            continue
        if len(x) < len(y):
            x, y = y, x
        todo.append(i)
        s1l.append(x)
        s2l.append(y)
    if not todo:
        return out

    idx = np.asarray(todo)
    order = np.argsort([len(s) for s in s1l], kind="stable")
    chunk = 1024
    for c0 in range(0, len(order), chunk):
        sel = order[c0 : c0 + chunk]
        c_s1 = [s1l[k] for k in sel]
        c_s2 = [s2l[k] for k in sel]
        dist = _affine_gap_dp_batch(c_s1, c_s2)
        norm = np.array([len(x) + len(y) for x, y in zip(c_s1, c_s2)], dtype=np.float64)
        out[idx[sel]] = dist / norm
    return out


def _affine_gap_dp_batch(s1: list[str], s2: list[str]) -> np.ndarray:
    """Run the Gotoh DP for a bucket of pairs simultaneously.
    Requires len(s1[k]) >= len(s2[k]) and s1[k] != s2[k], non-empty."""
    p = len(s1)
    l1max = max(len(s) for s in s1)
    l2max = max(len(s) for s in s2)
    c1, len1 = _encode_padded(s1, l1max)
    c2, len2 = _encode_padded(s2, l2max)

    j_idx = np.arange(l1max + 1, dtype=np.float64)
    v_cur = np.tile(GAP_W + SPACE_W * j_idx, (p, 1))
    v_cur[:, 0] = 0.0
    d = np.full((p, l1max + 1), np.inf)
    res = np.empty(p, dtype=np.float64)

    for i in range(1, l2max + 1):
        active = len2 >= i
        if not active.any():
            break
        v_prev = v_cur.copy()
        v_cur[active, 0] = GAP_W + SPACE_W * i
        ins = np.full(p, np.inf)
        ch2 = c2[:, i - 1]
        for j in range(1, l1max + 1):
            abbr = j > len2  # per-pair: gap beyond the shorter string
            gap_j = np.where(abbr, GAP_W * ABBR_SCALE, GAP_W)
            space_j = np.where(abbr, SPACE_W * ABBR_SCALE, SPACE_W)
            ins = np.minimum(ins, v_cur[:, j - 1] + gap_j) + space_j
            d[:, j] = np.minimum(d[:, j], v_prev[:, j] + GAP_W) + SPACE_W
            m = v_prev[:, j - 1] + np.where(c1[:, j - 1] == ch2, MATCH_W, MISMATCH_W)
            v = np.minimum(np.minimum(ins, d[:, j]), m)
            v_cur[:, j] = np.where(active, v, v_cur[:, j])
        done = len2 == i
        if done.any():
            rows = np.nonzero(done)[0]
            res[rows] = v_cur[rows, len1[rows]]
    return res


# ---------------------------------------------------------------------------
# K2: cosine TF / TF-IDF similarity (Text fields; simplecosine †)
# ---------------------------------------------------------------------------


def cosine_similarity(tokens_a: list[str] | None, tokens_b: list[str] | None,
                      idf: dict[str, float] | None = None) -> float:
    """Cosine of TF(-IDF) vectors over word tokens.  ``idf`` maps token
    → weight (default weight 1.0 for unseen tokens, i.e. plain TF when
    no corpus was supplied — simplecosine † behavior)."""
    if not tokens_a or not tokens_b:
        return float("nan")
    ca, cb = Counter(tokens_a), Counter(tokens_b)
    get = idf.get if idf is not None else None
    num = 0.0
    for t, fa in ca.items():
        fb = cb.get(t)
        if fb:
            w = get(t, 1.0) if get else 1.0
            num += fa * fb * w * w
    if num == 0.0:
        return 0.0
    na = math.sqrt(sum((f * (get(t, 1.0) if get else 1.0)) ** 2 for t, f in ca.items()))
    nb = math.sqrt(sum((f * (get(t, 1.0) if get else 1.0)) ** 2 for t, f in cb.items()))
    v = num / (na * nb)
    return 1.0 if v > 1.0 else v  # clamp float noise (identical sets)


def tf_stats(tokens: list[str], idf: dict[str, float] | None = None
             ) -> tuple[dict[str, int], float]:
    """Per-record term-frequency dict + vector norm, cacheable by
    record id so batch scoring doesn't rebuild counts per PAIR (each
    record participates in many candidate pairs)."""
    ca = Counter(tokens)
    get = idf.get if idf is not None else None
    norm = math.sqrt(sum((f * (get(t, 1.0) if get else 1.0)) ** 2
                         for t, f in ca.items()))
    return ca, norm


def cosine_from_stats(ca: dict[str, int], na: float,
                      cb: dict[str, int], nb: float,
                      idf: dict[str, float] | None = None) -> float:
    """Cosine from cached tf_stats; bit-identical to
    ``cosine_similarity`` (same iteration order and float ops)."""
    if not ca or not cb:
        return float("nan")
    get = idf.get if idf is not None else None
    num = 0.0
    for t, fa in ca.items():
        fb = cb.get(t)
        if fb:
            w = get(t, 1.0) if get else 1.0
            num += fa * fb * w * w
    if num == 0.0:
        return 0.0
    v = num / (na * nb)
    return 1.0 if v > 1.0 else v  # same clamp as cosine_similarity


def cosine_similarity_batch(tokens_a: list, tokens_b: list,
                            idf: dict[str, float] | None = None) -> np.ndarray:
    """Batched K2; python-loop over pairs but Counter work is C-level.
    (The hot path cost is the token multiset intersection, which has no
    dense vectorized form without a corpus-wide vocabulary matrix.)"""
    n = len(tokens_a)
    out = np.full(n, np.nan, dtype=np.float64)
    for i in range(n):
        out[i] = cosine_similarity(tokens_a[i], tokens_b[i], idf)
    return out


# ---------------------------------------------------------------------------
# K3: Jaccard over sets
# ---------------------------------------------------------------------------


def jaccard(set_a, set_b) -> float:
    if set_a is None or set_b is None:
        return float("nan")
    sa, sb = set(set_a), set(set_b)
    if not sa and not sb:
        return float("nan")
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def jaccard_batch(a: list, b: list) -> np.ndarray:
    return np.fromiter((jaccard(x, y) for x, y in zip(a, b)),
                       dtype=np.float64, count=len(a))


# ---------------------------------------------------------------------------
# K4–K6: exact / price / haversine
# ---------------------------------------------------------------------------


def exact_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """K4: 1.0 if equal else 0.0; NaN where either side missing."""
    a = np.asarray(a, dtype=object)
    b = np.asarray(b, dtype=object)
    missing = np.array([x is None or y is None for x, y in zip(a, b)])
    eq = np.array([x == y for x, y in zip(a, b)], dtype=np.float64)
    eq[missing] = np.nan
    return eq


def price_distance(a: float | None, b: float | None) -> float:
    """K5 (dedupe:dedupe/variables/price.py †): for prices > 0,
    |log10(a) - log10(b)|; NaN when missing or non-positive."""
    if a is None or b is None or a <= 0 or b <= 0:
        return float("nan")
    return abs(math.log10(a) - math.log10(b))


def price_distance_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.abs(np.log10(a) - np.log10(b))
        out[(a <= 0) | (b <= 0) | np.isnan(a) | np.isnan(b)] = np.nan
    return out


def haversine(lat1, lon1, lat2, lon2) -> float:
    """K6: great-circle distance in km."""
    if any(v is None for v in (lat1, lon1, lat2, lon2)):
        return float("nan")
    r = 6371.0
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1)
    dl = math.radians(lon2 - lon1)
    h = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * r * math.asin(math.sqrt(h))


def haversine_batch(lat1, lon1, lat2, lon2) -> np.ndarray:
    lat1, lon1, lat2, lon2 = (np.asarray(v, dtype=np.float64) for v in (lat1, lon1, lat2, lon2))
    r = 6371.0
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = np.radians(lat2 - lat1)
    dl = np.radians(lon2 - lon1)
    h = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2 * r * np.arcsin(np.sqrt(h))
