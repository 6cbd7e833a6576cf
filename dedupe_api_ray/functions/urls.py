"""URL canonicalization and host extraction for web-text pipelines.

Crawl dedup's first, cheapest lever: two fetches of one page usually
differ only by case, default port, fragment, or query-param order, so
a canonical URL column collapses most refetch duplicates before any
content hashing runs.  The reference has no URL operator — this is a
driver-brief training-data-pipeline addition, like extras/pii.py.

Canonical form (deliberately small, exactly specified, and
reproducible in SQL):

1. scheme and host lowercased (userinfo, path, query values
   untouched — userinfo is case-sensitive; an empty userinfo is
   dropped),
2. an explicit default port dropped (``:80`` for http, ``:443`` for
   https; any other port kept),
3. the fragment removed,
4. query parameters sorted bytewise (stable, duplicates kept),
   ``?`` dropped when the query is empty.

Strings that do not parse as ``scheme://...`` pass through unchanged
(and get a null host) rather than erroring — crawl data is dirty.

Scale shape: stateless ``map_batches`` task stage.  Parsing is ONE
RE2 ``extract_regex`` over the column; the only non-Arrow step is the
query-param sort, which is a single vectorized pandas lexsort over
the flattened param lists (no per-row Python).  Both Arrow and DuckDB
compile RE2, so the SQL oracle replays parsing byte-for-byte; param
sorting maps to DuckDB ``list_sort`` (binary collation == bytewise,
and UTF-8 byte order equals codepoint order).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# one-pass URL splitter (RFC-3986-shaped, RE2-portable): scheme,
# authority, path, ?query, #fragment.  Arrow's extract_regex needs
# NAMED groups; DuckDB regexp_extract takes the same pattern with
# group indexes.
URL_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
          r"(?P<auth>[^/?#]*)(?P<path>[^?#]*)"
          r"(?:\?(?P<query>[^#]*))?(?:#.*)?$")
# authority → [userinfo@]host[:port]; the greedy userinfo group takes
# everything up to the LAST '@' (hosts cannot contain '@'), and the
# port alternative is anchored at the end
PORT_RE = r"^(?:(?P<user>.*)@)?(?P<host>[^@]*?)(?::(?P<port>\d+))?$"

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _sort_join_params(query: pa.Array) -> pa.Array:
    """'b=2&a=1' → 'a=1&b=2' (bytewise-stable sort of '&' segments);
    nulls stay null, '' stays ''."""
    parts = pc.split_pattern(query, "&")
    flat = parts.flatten()
    row = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
    vals = flat.to_numpy(zero_copy_only=False)
    order = pd.DataFrame({"r": row, "v": vals}) \
        .sort_values(["r", "v"], kind="stable").index.to_numpy()
    sorted_flat = flat.take(pa.array(order, pa.int64()))
    offsets = pc.list_value_length(parts)
    off = np.zeros(len(parts) + 1, dtype=np.int32)
    np.cumsum(pc.fill_null(offsets, 0).to_numpy(zero_copy_only=False),
              out=off[1:])
    relisted = pa.ListArray.from_arrays(
        pa.array(off, pa.int32()), sorted_flat)
    joined = pc.binary_join(relisted, "&")
    # restore nulls (ListArray.from_arrays drops the validity bitmap)
    return pc.if_else(pc.is_valid(query), joined,
                      pa.scalar(None, pa.string()))


def canonicalize_urls(url: pa.Array | pa.ChunkedArray
                      ) -> tuple[pa.Array, pa.Array]:
    """(canonical_url, host) for a string column.  Unparseable rows
    pass through with a null host."""
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    m = pc.extract_regex(url, URL_RE)
    ok = pc.is_valid(m)
    scheme = pc.utf8_lower(pc.struct_field(m, "scheme"))
    auth = pc.struct_field(m, "auth")
    path = pc.struct_field(m, "path")
    # non-participating RE2 groups surface as "" (not null) from
    # Arrow's extract_regex — "no '?'" and "empty query" are the same
    query = pc.struct_field(m, "query")
    hp = pc.extract_regex(auth, PORT_RE)
    user = pc.struct_field(hp, "user")  # case-preserved, "" if absent
    host = pc.utf8_lower(pc.struct_field(hp, "host"))
    port = pc.struct_field(hp, "port")  # "" when no port
    default_port = pc.case_when(
        pc.make_struct(pc.equal(scheme, "http"),
                       pc.equal(scheme, "https")),
        "80", "443", pa.scalar(None, pa.string()))
    keep_port = pc.and_kleene(
        pc.and_kleene(pc.is_valid(port),
                      pc.not_equal(pc.fill_null(port, ""), "")),
        pc.not_equal(port, pc.fill_null(default_port, "")))
    hostport = pc.if_else(
        pc.fill_null(keep_port, False),
        pc.binary_join_element_wise(host, pc.fill_null(port, ""), ":"),
        host)
    # userinfo rides through case-preserved (it is case-sensitive);
    # an empty userinfo ("http://@h/") is dropped
    userpart = pc.if_else(
        pc.not_equal(pc.fill_null(user, ""), ""),
        pc.binary_join_element_wise(pc.fill_null(user, ""), "@", ""),
        "")
    q_sorted = _sort_join_params(query)
    q_part = pc.if_else(
        pc.and_kleene(pc.is_valid(q_sorted), pc.not_equal(q_sorted, "")),
        pc.binary_join_element_wise("?", pc.fill_null(q_sorted, ""), ""),
        "")
    canon = pc.binary_join_element_wise(
        scheme, "://", userpart, hostport, path, q_part, "")
    return (pc.if_else(ok, canon, url),
            pc.if_else(ok, host, pa.scalar(None, pa.string())))


def canonicalize_url_batches(ds: ray.data.Dataset, *,
                             url_col: str = "url",
                             canon_col: str = "url_canon",
                             host_col: str = "host") -> ray.data.Dataset:
    """Append canonical-URL and host columns (stateless map stage)."""

    def f(t: pa.Table) -> pa.Table:
        canon, host = canonicalize_urls(t[url_col])
        return t.append_column(canon_col, canon) \
            .append_column(host_col, host)

    return ds.map_batches(f, batch_format="pyarrow")
