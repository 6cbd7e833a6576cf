"""Text normalization, tokenization and HTML→text extraction.

Reference semantics reproduced (all †, see SURVEY.md §0):
- ``preProcess``  — dedupe-api:api/utils/helpers.py::preProcess †:
  strip control chars / newlines, collapse whitespace, casefold, strip,
  and map the empty string to null (missing).
- ``words`` / ``ngrams`` tokenizers — dedupe:dedupe/predicates.py::words,
  ngrams † : ``re.findall(r"[\\w']+", s)`` and char n-grams.

Everything here is vectorized with ``pyarrow.compute`` where the kernel
exists (lower / regex replace / trim are RE2-based, which keeps the
DuckDB oracle bit-compatible); tokenization falls back to a compiled
``re`` loop per value because Arrow has no findall kernel — the regex
work is C-level either way.

The HTML→text extractor is pure Python + ``re`` (no bs4/lxml in the
sandbox), deterministic and version-pinned so the per-row invariant
"byte-identical extracted text per url" (BASELINE.json input_hint)
holds across runs and parallelism levels.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ASCII \w so Python `re` and RE2 (pyarrow / DuckDB) agree exactly.
# dedupe uses r"[\w']+" with unicode \w †; we pin ASCII for oracle
# bit-compatibility and document the divergence.
TOKEN_RE = re.compile(r"[\w']+", re.ASCII)
TOKEN_PATTERN_SQL = r"[0-9A-Za-z_']+"  # the same class, spelled for RE2/DuckDB

EXTRACTOR_VERSION = "html-extract/1"

_WS_RE = re.compile(r"\s+")


def normalize_array(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """preProcess, vectorized: lower → collapse whitespace → trim → ''->null.

    Mirrors dedupe-api:api/utils/helpers.py::preProcess † (which strips
    newlines/extra whitespace, lowercases, and nulls empty strings).
    DuckDB oracle equivalent:
        nullif(trim(regexp_replace(lower(x), '\\s+', ' ', 'g')), '')
    """
    a = pc.utf8_lower(arr)
    a = pc.replace_substring_regex(a, r"\s+", " ")
    a = pc.utf8_trim_whitespace(a)
    a = pc.if_else(pc.equal(a, ""), pa.scalar(None, pa.string()), a)
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def normalize_str(s: str | None) -> str | None:
    """Scalar preProcess (oracle / driver-side path).

    Implemented THROUGH the same Arrow kernels as ``normalize_array``
    so scalar and vectorized paths are bit-identical by construction —
    a Python ``re`` reimplementation diverges on Unicode whitespace
    (RE2's ``\\s`` is ASCII-only, Python's is Unicode; U+00A0 is common
    in web text), which would give train-time and score-time different
    normalized strings for the same record."""
    if s is None:
        return None
    return normalize_array(pa.array([s], pa.string()))[0].as_py()


def tokens_of(s: str | None) -> list[str]:
    """Word tokens of a (normalized) string; dedupe predicates.words †."""
    if not s:
        return []
    return TOKEN_RE.findall(s)


def tokenize_array(arr: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    """Tokenize a string column into list<string> (one pass, hoisted:
    the reference re-tokenizes per predicate †, we tokenize once and
    every token predicate reuses the column — SURVEY.md §2 M3)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    values: list[str] = []
    offsets = np.empty(len(arr) + 1, dtype=np.int64)
    offsets[0] = 0
    findall = TOKEN_RE.findall
    for i, v in enumerate(arr.to_pylist()):
        if v:
            toks = findall(v)
            values.extend(toks)
        offsets[i + 1] = len(values)
    return pa.ListArray.from_arrays(pa.array(offsets), pa.array(values, pa.string()))


def ngrams(s: str, n: int) -> list[str]:
    """Character n-grams of the whitespace-joined field
    (dedupe:dedupe/predicates.py::ngrams †)."""
    return [s[i : i + n] for i in range(max(0, len(s) - n + 1))]


# ---------------------------------------------------------------------------
# HTML → text extraction (graft-specific, SURVEY.md §2 M2)
# ---------------------------------------------------------------------------

_SCRIPT_STYLE_RE = re.compile(
    rb"<(script|style)\b[^>]*>.*?</\1\s*>", re.DOTALL | re.IGNORECASE
)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]+>")
_ENTITIES = {
    b"&amp;": b"&",
    b"&lt;": b"<",
    b"&gt;": b">",
    b"&quot;": b'"',
    b"&#39;": b"'",
    b"&apos;": b"'",
    b"&nbsp;": b" ",
}
_BODY_RE = re.compile(rb"<body\b[^>]*>(.*?)</body\s*>", re.DOTALL | re.IGNORECASE)
_WS_B_RE = re.compile(rb"\s+")


def extract_text_bytes(html: bytes) -> str:
    """Deterministic, pure HTML→text: body → strip script/style/comments
    → strip tags → decode a fixed entity set → collapse whitespace.

    Pinned as ``EXTRACTOR_VERSION``; no parser-version or locale
    dependence, which is what makes the byte-identical-per-url
    invariant (BASELINE.json input_hint) testable across parallelism.
    """
    m = _BODY_RE.search(html)
    body = m.group(1) if m else html
    body = _SCRIPT_STYLE_RE.sub(b" ", body)
    body = _COMMENT_RE.sub(b" ", body)
    body = _TAG_RE.sub(b" ", body)
    for ent, rep in _ENTITIES.items():
        body = body.replace(ent, rep)
    body = _WS_B_RE.sub(b" ", body).strip()
    return body.decode("utf-8", errors="replace")


def extract_text_batch(batch: pa.Table, html_col: str = "html",
                       out_col: str = "text_extracted") -> pa.Table:
    """map_batches stage: derive ``out_col`` from the raw ``html`` column."""
    htmls = batch[html_col].to_pylist()
    out = pa.array([extract_text_bytes(h) if h is not None else None for h in htmls],
                   pa.string())
    return batch.append_column(out_col, out)
