"""Blocking-key predicates (SURVEY.md §2.3, P1–P19).

Each simple predicate maps one (normalized) field value → a set of
block-key strings; the learned blocker is a union of (possibly
compound) predicates.  Reference: dedupe:dedupe/predicates.py † —
function names below mirror the public dedupe names; exact key-string
formats follow public knowledge of that module; where details are
uncertain the chosen form is documented and mirrored in the oracle so
engine↔oracle consistency is what gets tested (SURVEY.md §0).

Predicates operate on already-normalized values (functions.text
.normalize_str semantics) and, when a token list is supplied, reuse the
hoisted tokens column instead of re-tokenizing (SURVEY.md §2 M3).
"""

from __future__ import annotations

import math
import re
from collections.abc import Callable, Iterable

from dedupe_api_ray.functions.text import ngrams, tokens_of

# ASCII \d (like TOKEN_RE's ASCII \w): Python's unicode \d matches
# e.g. Arabic-Indic digits that RE2 (pyarrow / DuckDB oracle) and the
# vectorized emission path (blocking.vectorized) do not — pinning ASCII
# keeps scalar, vectorized and oracle key sets bit-identical.
_INT_RE = re.compile(r"\d+", re.ASCII)
_FIRST_INT_RE = re.compile(r"^\d+", re.ASCII)
_ALPHANUM_RE = re.compile(r"\w*\d+\w*", re.ASCII)
_FIRST_TOKEN_RE = re.compile(r"[\w']+", re.ASCII)

Strings = Iterable[str]


# --- string predicates ------------------------------------------------------

def whole_field(field: str) -> Strings:  # P1
    return (field,)


def token_field(field: str, tokens: list[str] | None = None) -> Strings:  # P2
    return set(tokens if tokens is not None else tokens_of(field))


def first_token(field: str) -> Strings:  # P3
    m = _FIRST_TOKEN_RE.match(field)
    return (m.group(0),) if m else ()


def first_two_tokens(field: str, tokens: list[str] | None = None) -> Strings:  # P4
    toks = tokens if tokens is not None else tokens_of(field)
    return (" ".join(toks[:2]),) if len(toks) >= 2 else ()


def common_two_tokens(field: str, tokens: list[str] | None = None) -> Strings:  # P4
    toks = tokens if tokens is not None else tokens_of(field)
    return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}


def common_three_tokens(field: str, tokens: list[str] | None = None) -> Strings:  # P4
    toks = tokens if tokens is not None else tokens_of(field)
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def common_integer(field: str) -> Strings:  # P5
    return {str(int(i)) for i in _INT_RE.findall(field)}


def first_integer(field: str) -> Strings:  # P6
    m = _FIRST_INT_RE.match(field)
    return (str(int(m.group(0))),) if m else ()


def near_integers(field: str) -> Strings:  # P7
    out: set[str] = set()
    for i in _INT_RE.findall(field):
        n = int(i)
        out.update((str(n - 1), str(n), str(n + 1)))
    return out


def alpha_numeric(field: str) -> Strings:  # P8
    return set(_ALPHANUM_RE.findall(field))


def common_four_gram(field: str) -> Strings:  # P9
    return set(ngrams(field.replace(" ", ""), 4))


def common_six_gram(field: str) -> Strings:  # P9
    return set(ngrams(field.replace(" ", ""), 6))


def one_gram_fingerprint(field: str) -> Strings:  # P9
    return ("".join(sorted(set(field.replace(" ", "")))),)


def two_gram_fingerprint(field: str) -> Strings:  # P9
    g = field.replace(" ", "")
    if len(g) < 2:
        return ()
    return ("".join(sorted(set(ngrams(g, 2)))),)


def fingerprint(field: str, tokens: list[str] | None = None) -> Strings:  # P10
    toks = tokens if tokens is not None else tokens_of(field)
    return ("".join(sorted(toks)),) if toks else ()


def same_three_char_start(field: str) -> Strings:  # P11
    return (field[:3],) if field else ()


def same_five_char_start(field: str) -> Strings:  # P11
    return (field[:5],) if field else ()


def same_seven_char_start(field: str) -> Strings:  # P11
    return (field[:7],) if field else ()


def suffix_array(field: str) -> Strings:  # P12 — suffixes of length >= 5
    return {field[i:] for i in range(max(0, len(field) - 4))}


def sorted_acronym(field: str, tokens: list[str] | None = None) -> Strings:  # P13
    toks = tokens if tokens is not None else tokens_of(field)
    return ("".join(t[0] for t in sorted(toks)),) if toks else ()


# --- phonetic (P14) ---------------------------------------------------------
# The reference keys on the doublemetaphone C extension †; blocking
# uses the from-scratch Double Metaphone in blocking.phonetic (both
# primary and secondary codes emitted, like dedupe's predicates).  The
# original single Metaphone below is retained as a cheaper registry
# alternative.

_VOWELS = set("aeiou")


def _metaphone(word: str) -> str:
    w = re.sub(r"[^a-z]", "", word.lower())
    if not w:
        return ""
    # initial-letter exceptions
    for pre, rep in (("ae", "e"), ("gn", "n"), ("kn", "n"), ("pn", "n"),
                     ("wr", "r"), ("x", "s"), ("wh", "w")):
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    out = []
    i, n = 0, len(w)
    while i < n and len(out) < 6:
        c = w[i]
        nxt = w[i + 1] if i + 1 < n else ""
        prev = w[i - 1] if i > 0 else ""
        if c in _VOWELS:
            if i == 0:
                out.append(c.upper())
            i += 1
            continue
        if c == prev and c != "c":  # drop doubled consonants
            i += 1
            continue
        if c in "fjlmnr":
            out.append(c.upper())
        elif c == "b":
            if not (i == n - 1 and prev == "m"):
                out.append("B")
        elif c == "c":
            if nxt == "h":
                out.append("X"); i += 1
            elif nxt in "iey":
                out.append("S")
            else:
                out.append("K")
        elif c == "d":
            if nxt == "g" and i + 2 < n and w[i + 2] in "iey":
                out.append("J"); i += 2
            else:
                out.append("T")
        elif c == "g":
            if nxt == "h":
                out.append("K"); i += 1
            elif nxt in "iey":
                out.append("J")
            else:
                out.append("K")
        elif c == "h":
            if prev in _VOWELS and nxt not in _VOWELS:
                pass
            else:
                out.append("H")
        elif c == "k":
            if prev != "c":
                out.append("K")
        elif c == "p":
            if nxt == "h":
                out.append("F"); i += 1
            else:
                out.append("P")
        elif c == "q":
            out.append("K")
        elif c == "s":
            if nxt == "h":
                out.append("X"); i += 1
            elif nxt == "i" and i + 2 < n and w[i + 2] in "oa":
                out.append("X")
            else:
                out.append("S")
        elif c == "t":
            if nxt == "h":
                out.append("0"); i += 1
            elif nxt == "i" and i + 2 < n and w[i + 2] in "oa":
                out.append("X")
            else:
                out.append("T")
        elif c == "v":
            out.append("F")
        elif c == "w":
            if nxt in _VOWELS:
                out.append("W")
        elif c == "x":
            out.append("KS")
        elif c == "y":
            if nxt in _VOWELS:
                out.append("Y")
        elif c == "z":
            out.append("S")
        i += 1
    return "".join(out)


def metaphone_field(field: str) -> Strings:  # P14 (whole field, both codes)
    from dedupe_api_ray.blocking.phonetic import double_metaphone

    p, q = double_metaphone(field.replace(" ", ""))
    return {c for c in (p, q) if c}


def metaphone_token(field: str, tokens: list[str] | None = None) -> Strings:  # P14
    from dedupe_api_ray.blocking.phonetic import double_metaphone

    toks = tokens if tokens is not None else tokens_of(field)
    out: set[str] = set()
    for t in toks:
        p, q = double_metaphone(t)
        if p:
            out.add(p)
        if q:
            out.add(q)
    return out


def single_metaphone_field(field: str) -> Strings:  # cheaper alternative
    code = _metaphone(field.replace(" ", ""))
    return (code,) if code else ()


# --- set predicates (P15) — operate on list/set values ----------------------

def whole_set(value) -> Strings:
    s = sorted(set(value)) if value else []
    return (",".join(s),) if s else ()


def common_set_element(value) -> Strings:
    return {str(v) for v in set(value)} if value else set()


def last_set_element(value) -> Strings:
    return (str(max(set(value))),) if value else ()


def first_set_element(value) -> Strings:
    return (str(min(set(value))),) if value else ()


def magnitude_of_cardinality(value) -> Strings:
    return order_of_magnitude(len(set(value))) if value else ()


# --- numeric predicates (P16) ----------------------------------------------

def order_of_magnitude(value) -> Strings:
    try:
        v = float(value)
    except (TypeError, ValueError):
        return ()
    if v <= 0:
        return ()
    return (str(int(round(math.log10(v)))),)


def round_to_1(value) -> Strings:
    try:
        v = float(value)
    except (TypeError, ValueError):
        return ()
    if v == 0:
        return ("0",)
    mag = int(math.floor(math.log10(abs(v))))
    return (str(int(round(v, -mag))),)


# --- geo (P17) --------------------------------------------------------------

def lat_long_grid(value) -> Strings:
    """P17 latLongGridPredicate: block (lat, lon) pairs into 0.1-degree
    grid cells.  The reference keys on `round(dim, 1)` †; we key on
    `floor(dim * 10)` instead — same grid granularity, but floor is
    bit-identical between Python and ANSI SQL (round's half-even vs
    half-away edge cases are not), so the oracle can reproduce keys
    exactly.  Documented divergence (SURVEY.md §0 rule: with the
    reference absent, engine↔oracle consistency is what gets tested)."""
    try:
        lat, lon = value[0], value[1]
    except (TypeError, IndexError, KeyError):
        return ()
    if lat is None or lon is None or (not lat and not lon):
        return ()
    return (f"{int(math.floor(float(lat) * 10))}|"
            f"{int(math.floor(float(lon) * 10))}",)


# --- existence (P18) --------------------------------------------------------

def exists(value) -> Strings:
    return ("1",) if value not in (None, "", [], ()) else ("0",)


# --- registry ---------------------------------------------------------------

# name -> (fn, accepts_tokens, applicable field kinds)
SIMPLE_PREDICATES: dict[str, tuple[Callable, bool, tuple[str, ...]]] = {
    "wholeFieldPredicate": (whole_field, False, ("String", "ShortString", "Text")),
    "tokenFieldPredicate": (token_field, True, ("String", "ShortString", "Text")),
    "firstTokenPredicate": (first_token, False, ("String", "ShortString", "Text")),
    "firstTwoTokensPredicate": (first_two_tokens, True, ("String", "ShortString", "Text")),
    "commonTwoTokens": (common_two_tokens, True, ("String", "ShortString", "Text")),
    "commonThreeTokens": (common_three_tokens, True, ("String", "ShortString", "Text")),
    "commonIntegerPredicate": (common_integer, False, ("String", "ShortString", "Text")),
    "firstIntegerPredicate": (first_integer, False, ("String", "ShortString", "Text")),
    "nearIntegersPredicate": (near_integers, False, ("String", "ShortString", "Text")),
    "alphaNumericPredicate": (alpha_numeric, False, ("String", "ShortString", "Text")),
    "commonFourGram": (common_four_gram, False, ("String", "ShortString")),
    "commonSixGram": (common_six_gram, False, ("String", "ShortString")),
    "oneGramFingerprint": (one_gram_fingerprint, False, ("String", "ShortString")),
    "twoGramFingerprint": (two_gram_fingerprint, False, ("String", "ShortString")),
    "fingerprint": (fingerprint, True, ("String", "ShortString", "Text")),
    "sameThreeCharStartPredicate": (same_three_char_start, False, ("String", "ShortString", "Text")),
    "sameFiveCharStartPredicate": (same_five_char_start, False, ("String", "ShortString", "Text")),
    "sameSevenCharStartPredicate": (same_seven_char_start, False, ("String", "ShortString", "Text")),
    "suffixArrayPredicate": (suffix_array, False, ("String", "ShortString")),
    "sortedAcronym": (sorted_acronym, True, ("String", "ShortString")),
    "doubleMetaphone": (metaphone_field, False, ("String", "ShortString")),
    "metaphoneToken": (metaphone_token, True, ("String", "ShortString")),
    "singleMetaphone": (single_metaphone_field, False, ("String", "ShortString")),
    "wholeSetPredicate": (whole_set, False, ("Set",)),
    "commonSetElementPredicate": (common_set_element, False, ("Set",)),
    "lastSetElementPredicate": (last_set_element, False, ("Set",)),
    "firstSetElementPredicate": (first_set_element, False, ("Set",)),
    "magnitudeOfCardinality": (magnitude_of_cardinality, False, ("Set",)),
    "latLongGridPredicate": (lat_long_grid, False, ("LatLong",)),
    "orderOfMagnitude": (order_of_magnitude, False, ("Price",)),
    "roundTo1": (round_to_1, False, ("Price",)),
    "existsPredicate": (exists, False, ("String", "ShortString", "Text", "Set", "Price", "Exists")),
}


def register_predicate(name: str, fn: Callable, accepts_tokens: bool = False,
                       kinds: tuple[str, ...] = ("String",)) -> None:
    """User-extension surface (SURVEY.md §2.11): add a predicate to the
    registry; the learned predicate union references it by name, so the
    model artifact stays data, not code."""
    SIMPLE_PREDICATES[name] = (fn, accepts_tokens, kinds)


def predicates_for_kind(kind: str) -> list[str]:
    return [n for n, (_, _, kinds) in SIMPLE_PREDICATES.items() if kind in kinds]
