"""Vectorized blocking-key emission for the hot predicates.

The reference evaluates predicates per record in a Python generator
(dedupe:dedupe/blocking.py::Fingerprinter †); round-4 profiling showed
that per-record loop as the single hottest stateless stage of the
flagship ``partition()`` (the emission itself, not the regex work).
This module re-expresses each hot predicate as pure Arrow / numpy
column kernels emitting ``(keys: pa.StringArray, rows: np.int64[])``
pairs per batch — byte-identical to ``model._record_keys`` (asserted
in ``tests/test_vectorized_blocking.py``), including:

- the ``v in (None, "")`` missing-value guard (rows with a null or
  empty field emit nothing);
- per-record SET semantics (duplicate keys within one record's one
  predicate are deduped; cross-record duplicates stay, as in the
  scalar path);
- rows are emitted in nondecreasing row order (the compound composer
  relies on contiguous per-row segments).

Predicates with genuinely scalar structure (suffixArray, metaphone,
set/price/latlong kinds, char-n-grams) stay on the scalar fallback in
``stages.blocking.Fingerprinter``; a model mixing both kinds pays the
Python loop only for the scalar ones.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from dedupe_api_ray.functions.text import tokenize_array

_EMPTY = (pa.array([], pa.string()), np.empty(0, np.int64))


def _as_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _field_mask(col: pa.Array) -> np.ndarray:
    """The scalar guard ``v in (None, "")`` as a boolean keep-mask."""
    ok = pc.and_kleene(pc.is_valid(col), pc.not_equal(col, ""))
    return pc.fill_null(ok, False).to_numpy(zero_copy_only=False)


def _dedup_per_row(keys: pa.Array, rows: np.ndarray
                   ) -> tuple[pa.Array, np.ndarray]:
    """Set semantics per record: drop duplicate (row, key) pairs.
    Output stays sorted by row (stable within — order is irrelevant,
    keys flow into a groupby)."""
    if len(rows) == 0:
        return _EMPTY
    d = keys.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((codes, rows))
    c, r = codes[order], rows[order]
    keep = np.ones(len(c), dtype=bool)
    keep[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
    take = order[keep]
    return keys.take(pa.array(take, pa.int64())), rows[take]


def _list_parts(lst: pa.Array) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """(absolute value-offsets per row, lengths per row, values) of a
    list<string> array — offsets stay ABSOLUTE indices into ``values``
    so sliced arrays gather correctly."""
    lst = _as_array(lst)
    off = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # a sliced ListArray's offsets buffer is unsliced; index by the
    # array's own offset window
    off = off[lst.offset:lst.offset + len(lst) + 1]
    return off[:-1], np.diff(off), lst.values


def _flatten(lst: pa.Array) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """(value positions, row of each value, values) for a list array."""
    starts, lens, vals = _list_parts(lst)
    total = int(lens.sum())
    rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    excl = np.concatenate(([0], np.cumsum(lens)))[:-1]
    pos = np.arange(total, dtype=np.int64) - np.repeat(excl, lens) \
        + np.repeat(starts, lens)
    return pos, rows, vals


def _digit_runs(col: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """(row of each run, normalized digit runs) — ``str(int(run))``
    without an int cast (runs can exceed int64): ltrim zeros, '' → '0'.
    Matches ``common_integer``'s set-input values per row (pre-dedup)."""
    runs = pc.split_pattern_regex(col, r"\D+")
    pos, rows, vals = _flatten(runs)
    take = pa.array(pos, pa.int64())
    v = vals.take(take)
    nonempty = pc.fill_null(pc.not_equal(v, ""), False) \
        .to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(nonempty)
    v = v.take(pa.array(idx, pa.int64()))
    norm = pc.utf8_ltrim(v, "0")
    norm = pc.if_else(pc.equal(norm, ""), pa.scalar("0", pa.string()),
                      norm)
    return rows[idx], norm


# --- emitters: fn(col, tokens|None) -> (keys, rows) -------------------------


def _v_whole_field(col: pa.Array, tokens) -> tuple[pa.Array, np.ndarray]:
    rows = np.flatnonzero(_field_mask(col))
    return col.take(pa.array(rows, pa.int64())), rows


def _v_first_token(col: pa.Array, tokens) -> tuple[pa.Array, np.ndarray]:
    m = _field_mask(col)
    ext = pc.struct_field(pc.extract_regex(col, r"^(?P<k>[\w']+)"), "k")
    hit = m & pc.is_valid(ext).to_numpy(zero_copy_only=False)
    rows = np.flatnonzero(hit)
    return ext.take(pa.array(rows, pa.int64())), rows


def _v_char_start(k: int):
    def fn(col: pa.Array, tokens) -> tuple[pa.Array, np.ndarray]:
        rows = np.flatnonzero(_field_mask(col))
        take = pa.array(rows, pa.int64())
        return pc.utf8_slice_codeunits(col.take(take), 0, k), rows
    return fn


def _tokens_or_derive(col: pa.Array, tokens) -> pa.Array:
    return _as_array(tokens) if tokens is not None else tokenize_array(col)


def _v_token_field(col: pa.Array, tokens) -> tuple[pa.Array, np.ndarray]:
    lst = _tokens_or_derive(col, tokens)
    pos, rows, vals = _flatten(lst)
    m = _field_mask(col)
    keep = np.flatnonzero(m[rows])
    keys = vals.take(pa.array(pos[keep], pa.int64()))
    return _dedup_per_row(keys, rows[keep])


def _v_fingerprint(col: pa.Array, tokens) -> tuple[pa.Array, np.ndarray]:
    """"".join(sorted(toks)) per row: value-rank the flattened tokens
    (Arrow dictionary + one sort of the DISTINCT values), lexsort by
    (row, rank) — UTF-8 byte order equals codepoint order, so the rank
    matches Python ``sorted`` — rebuild the list, ``binary_join``."""
    lst = _tokens_or_derive(col, tokens)
    starts, lens, _ = _list_parts(lst)
    pos, rows, vals = _flatten(lst)
    if len(pos) == 0:
        return _EMPTY
    flat = vals.take(pa.array(pos, pa.int64()))
    d = flat.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    sidx = pc.array_sort_indices(d.dictionary).to_numpy(
        zero_copy_only=False).astype(np.int64)
    rank = np.empty(len(sidx), np.int64)
    rank[sidx] = np.arange(len(sidx))
    order = np.lexsort((rank[codes], rows))
    # rows are 0..n-1 grouped in order, so per-row segment offsets are
    # just the cumulative lengths
    new_off = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    sorted_lst = pa.ListArray.from_arrays(
        pa.array(new_off, pa.int32()), flat.take(pa.array(order, pa.int64())))
    joined = pc.binary_join(sorted_lst, "")
    hit = np.flatnonzero(_field_mask(col) & (lens > 0))
    return joined.take(pa.array(hit, pa.int64())), hit


def _v_first_two_tokens(col: pa.Array, tokens
                        ) -> tuple[pa.Array, np.ndarray]:
    lst = _tokens_or_derive(col, tokens)
    starts, lens, vals = _list_parts(lst)
    rows = np.flatnonzero(_field_mask(col) & (lens >= 2))
    s = starts[rows]
    t0 = vals.take(pa.array(s, pa.int64()))
    t1 = vals.take(pa.array(s + 1, pa.int64()))
    return pc.binary_join_element_wise(t0, t1, pa.scalar(" ")), rows


def _v_common_w_tokens(w: int):
    def fn(col: pa.Array, tokens) -> tuple[pa.Array, np.ndarray]:
        lst = _tokens_or_derive(col, tokens)
        starts, lens, vals = _list_parts(lst)
        m = _field_mask(col)
        nwin = np.where(m, np.maximum(lens - w + 1, 0), 0)
        total = int(nwin.sum())
        if total == 0:
            return _EMPTY
        rows = np.repeat(np.arange(len(lens), dtype=np.int64), nwin)
        excl = np.concatenate(([0], np.cumsum(nwin)))[:-1]
        first = np.arange(total, dtype=np.int64) \
            - np.repeat(excl, nwin) + np.repeat(starts, nwin)
        parts = [vals.take(pa.array(first + j, pa.int64()))
                 for j in range(w)]
        keys = pc.binary_join_element_wise(*parts, pa.scalar(" "))
        return _dedup_per_row(keys, rows)
    return fn


def _v_common_integer(col: pa.Array, tokens) -> tuple[pa.Array, np.ndarray]:
    m = _field_mask(col)
    rows, norm = _digit_runs(col)
    keep = np.flatnonzero(m[rows])
    return _dedup_per_row(norm.take(pa.array(keep, pa.int64())), rows[keep])


def _v_first_integer(col: pa.Array, tokens) -> tuple[pa.Array, np.ndarray]:
    m = _field_mask(col)
    ext = pc.struct_field(pc.extract_regex(col, r"^(?P<k>\d+)"), "k")
    hit = m & pc.is_valid(ext).to_numpy(zero_copy_only=False)
    rows = np.flatnonzero(hit)
    v = ext.take(pa.array(rows, pa.int64()))
    norm = pc.utf8_ltrim(v, "0")
    norm = pc.if_else(pc.equal(norm, ""), pa.scalar("0", pa.string()), norm)
    return norm, rows


def _v_alpha_numeric(col: pa.Array, tokens) -> tuple[pa.Array, np.ndarray]:
    """Maximal ``\\w`` runs containing a digit == findall of
    ``\\w*\\d+\\w*`` (greedy leftmost swallows the whole run)."""
    m = _field_mask(col)
    runs = pc.split_pattern_regex(col, r"\W+")
    pos, rows, vals = _flatten(runs)
    v = vals.take(pa.array(pos, pa.int64()))
    hasd = pc.fill_null(pc.match_substring_regex(v, r"\d"), False) \
        .to_numpy(zero_copy_only=False)
    keep = np.flatnonzero(hasd & m[rows])
    return _dedup_per_row(v.take(pa.array(keep, pa.int64())), rows[keep])


VECTOR_EMITTERS = {
    "wholeFieldPredicate": _v_whole_field,
    "firstTokenPredicate": _v_first_token,
    "sameThreeCharStartPredicate": _v_char_start(3),
    "sameFiveCharStartPredicate": _v_char_start(5),
    "sameSevenCharStartPredicate": _v_char_start(7),
    "tokenFieldPredicate": _v_token_field,
    "fingerprint": _v_fingerprint,
    "firstTwoTokensPredicate": _v_first_two_tokens,
    "commonTwoTokens": _v_common_w_tokens(2),
    "commonThreeTokens": _v_common_w_tokens(3),
    "commonIntegerPredicate": _v_common_integer,
    "firstIntegerPredicate": _v_first_integer,
    "alphaNumericPredicate": _v_alpha_numeric,
}


_WANTS_TOKENS = {"tokenFieldPredicate", "fingerprint",
                 "firstTwoTokensPredicate", "commonTwoTokens",
                 "commonThreeTokens"}


def can_vectorize(spec) -> bool:
    """True iff the spec (simple or compound) runs entirely on the
    Arrow emitters above."""
    if spec.kind == "simple":
        return spec.name in VECTOR_EMITTERS
    if spec.kind == "compound":
        return all(n in VECTOR_EMITTERS for n, _ in spec.parts)
    return False


def _emit_simple(name: str, field: str, batch: pa.Table,
                 token_cache: dict) -> tuple[pa.Array, np.ndarray]:
    if field not in batch.column_names:
        return _EMPTY
    col = _as_array(batch[field])
    tk = f"{field}__tokens"
    tokens = None
    fn = VECTOR_EMITTERS[name]
    if name in _WANTS_TOKENS:
        if tk in batch.column_names:
            tokens = _as_array(batch[tk])
        else:  # derive once per (batch, field), shared across specs
            if field not in token_cache:
                token_cache[field] = tokenize_array(col)
            tokens = token_cache[field]
    return fn(col, tokens)


def _cross_join_rows(ka: pa.Array, ra: np.ndarray, kb: pa.Array,
                     rb: np.ndarray, n: int
                     ) -> tuple[pa.Array, np.ndarray]:
    """Per-row cross product 'a|b' of two per-row-deduped, row-sorted
    key sets (the compound predicate P19).  Fully vectorized: repeat
    each A key by its row's B count, gather B by segment arithmetic."""
    if len(ra) == 0 or len(rb) == 0:
        return _EMPTY
    cnt_b = np.bincount(rb, minlength=n)
    seg_b = np.concatenate(([0], np.cumsum(cnt_b)))[:-1]
    reps = cnt_b[ra]
    keep = np.flatnonzero(reps > 0)
    reps = reps[keep]
    total = int(reps.sum())
    if total == 0:
        return _EMPTY
    a_take = np.repeat(keep, reps)
    excl = np.concatenate(([0], np.cumsum(reps)))[:-1]
    within = np.arange(total, dtype=np.int64) - np.repeat(excl, reps)
    b_take = np.repeat(seg_b[ra[keep]], reps) + within
    keys = pc.binary_join_element_wise(
        ka.take(pa.array(a_take, pa.int64())),
        kb.take(pa.array(b_take, pa.int64())), pa.scalar("|"))
    # dedup: 'a|b' strings can collide across distinct (a, b) pairs
    # when keys contain '|' — the scalar path's set dedups those
    return _dedup_per_row(keys, ra[a_take])


def emit_spec(spec, batch: pa.Table, token_cache: dict
              ) -> tuple[pa.Array, np.ndarray]:
    """Evaluate one vectorizable PredicateSpec over a whole batch:
    (block keys, row indices), matching ``model._record_keys`` per row."""
    if spec.kind == "simple":
        return _emit_simple(spec.name, spec.field, batch, token_cache)
    (n1, f1), (n2, f2) = spec.parts
    ka, ra = _emit_simple(n1, f1, batch, token_cache)
    if len(ra) == 0:
        return _EMPTY
    kb, rb = _emit_simple(n2, f2, batch, token_cache)
    return _cross_join_rows(ka, ra, kb, rb, len(batch))
