"""Vectorized JSON scalar extraction for flat telemetry payloads
(the ``events.props`` shape: one small flat object per row).

Fast path: ONE Arrow RE2 ``extract_regex`` kernel per column — no
per-row Python, no JSON parser allocation.  It handles flat objects
with string / number / boolean / null values.  Out of scope for the
fast path (use ``JsonParseRows``): nested objects/arrays under the
requested key, and backslash escapes inside string values (the regex
returns them raw instead of unescaping).

Disambiguation note: ``extract_regex`` yields '' for NON-PARTICIPATING
named groups, which would collide with a real empty-string value — but
the bare-token group ``jv`` can never legitimately match '' (it
requires >=1 char), so ``jv == ''`` ⇔ the quoted-string branch
matched, making the split exact.

``JsonParseRows`` is the exact fallback: an actor-pool stage running
``json.loads`` per row for arbitrary JSON — linear Python, documented
as the slow path for payloads the regex contract excludes.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa
import pyarrow.compute as pc

# <= 18 digits: always inside int64, so the Arrow cast can never throw
# (a 19-digit literal can overflow; such values return null instead)
_INT_RE = r"^-?[0-9]{1,18}$"


def _raw(col: pa.ChunkedArray | pa.Array, key: str):
    pat = (f'"{re.escape(key)}"\\s*:\\s*'
           r'(?:"(?P<js>(?:[^"\\]|\\.)*)"|(?P<jv>[^,}\s]+))')
    m = pc.extract_regex(col, pat)
    valid = pc.is_valid(m)
    return valid, pc.struct_field(m, "js"), pc.struct_field(m, "jv")


def extract_json_string(col: pa.ChunkedArray | pa.Array,
                        key: str) -> pa.ChunkedArray | pa.Array:
    """The key's scalar value as a string — DuckDB
    ``json_extract_string`` semantics: numbers/booleans come back as
    their literal text, and a JSON ``null`` value yields SQL null
    (exactly like a missing key — the same collapse DuckDB and the
    ``JsonParseRows`` fallback make).  Null/unparseable row → null."""
    valid, js, jv = _raw(col, key)
    jvf = pc.fill_null(jv, "")
    out = pc.if_else(pc.equal(jvf, ""), js, jv)
    ok = pc.and_(valid, pc.not_equal(jvf, "null"))
    return pc.if_else(ok, out, pa.scalar(None, pa.string()))


def extract_json_int(col: pa.ChunkedArray | pa.Array,
                     key: str) -> pa.ChunkedArray | pa.Array:
    """The key's value as int64; null when the key is absent or the
    value is not a bare base-10 integer of <= 18 digits (longer
    literals may overflow int64, so they null out rather than risk a
    batch-killing cast error)."""
    valid, _js, jv = _raw(col, key)
    is_int = pc.match_substring_regex(pc.fill_null(jv, ""), _INT_RE)
    ok = pc.and_(valid, is_int)
    safe = pc.if_else(ok, jv, "0")  # placeholder, nulled after cast
    return pc.if_else(ok, pc.cast(safe, pa.int64()),
                      pa.scalar(None, pa.int64()))


class JsonParseRows:
    """Exact fallback (actor-pool stage): ``json.loads`` per row,
    emitting the requested keys as string columns (non-scalar values
    re-serialized compactly).  Linear per-row Python — use only for
    payloads outside the fast path's flat-object contract."""

    def __init__(self, col: str, keys: list[str]):
        self.col, self.keys = col, list(keys)

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs: dict[str, list] = {k: [] for k in self.keys}
        for v in batch[self.col].to_pylist():
            try:
                obj = json.loads(v) if v else {}
            except (TypeError, ValueError):
                obj = {}
            if not isinstance(obj, dict):
                obj = {}  # valid non-object JSON ('[1]', '5', 'null')
            for k in self.keys:
                x = obj.get(k)
                if x is None:
                    outs[k].append(None)
                elif isinstance(x, str):
                    outs[k].append(x)
                elif isinstance(x, bool):
                    outs[k].append("true" if x else "false")
                elif isinstance(x, (dict, list)):
                    outs[k].append(json.dumps(x, separators=(",", ":")))
                else:
                    outs[k].append(repr(x) if not isinstance(x, float)
                                   else json.dumps(x))
        cols = {c: batch[c] for c in batch.column_names}
        for k in self.keys:
            cols[f"{self.col}_{k}"] = pa.array(outs[k], pa.string())
        return pa.table(cols)
