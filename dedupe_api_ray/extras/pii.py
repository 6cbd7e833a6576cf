"""PII detection and redaction for web-text training pipelines.

A standard pre-training scrub stage (driver-brief §text-analysis
family; the reference has no PII operator — this is one of the
"operations a large-scale training-data pipeline would need" the
brief adds as first-class components).

Design: every kernel is a pyarrow.compute RE2 call over the whole
batch column — zero Python in the hot path, zero per-row work.  The
patterns are deliberately written in the RE2 subset that DuckDB's
regexp functions share, verified equivalent kernel-for-kernel
(``count_substring_regex`` == ``len(regexp_extract_all(...))``,
``replace_substring_regex`` == ``regexp_replace(..., 'g')``), so the
SQL oracle reproduces counts AND redacted text byte-for-byte.

Scale shape: stateless ``map_batches`` task stage — embarrassingly
parallel, no shuffle, no state; at 100 TB it is bandwidth-bound on
the read like every other normalizer.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# (name, RE2 pattern, replacement) in APPLICATION ORDER.  Order is
# part of the contract: SSN is redacted before PHONE so the 3-2-4
# digit group can never be half-consumed by a phone match, and EMAIL
# first so its local part is intact when matched.  All patterns are
# ASCII / RE2-portable (DuckDB and Arrow both compile them with RE2).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\(?\d{3}\)?[-. ]\d{3}[-. ]?\d{4}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_counts_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append one ``n_<kind>`` int64 column per PII pattern plus the
    ``n_pii`` total.  Counts are measured independently on the INPUT
    text (not the progressively-redacted text), so each column is a
    well-defined per-pattern occurrence count."""
    col = batch[text_col]
    total = None
    for name, pattern, _ in PII_PATTERNS:
        n = pc.cast(pc.count_substring_regex(col, pattern=pattern),
                    pa.int64())
        n = pc.fill_null(n, 0)
        batch = batch.append_column(f"n_{name}", n)
        total = n if total is None else pc.add(total, n)
    return batch.append_column("n_pii", total)


def redact_pii_batch(batch: pa.Table, text_col: str = "text",
                     out_col: str = "text_redacted") -> pa.Table:
    """Append ``out_col``: the text with every PII pattern replaced by
    its placeholder, applied in ``PII_PATTERNS`` order."""
    col = batch[text_col]
    for _, pattern, replacement in PII_PATTERNS:
        col = pc.replace_substring_regex(col, pattern=pattern,
                                         replacement=replacement)
    return batch.append_column(out_col, col)


def scrub_pii(ds: ray.data.Dataset, text_col: str = "text",
              counts: bool = True) -> ray.data.Dataset:
    """Dataset-level scrub: per-pattern counts (optional) + redacted
    text, one vectorized pass."""
    def fn(t: pa.Table) -> pa.Table:
        if counts:
            t = pii_counts_batch(t, text_col)
        return redact_pii_batch(t, text_col)
    return ds.map_batches(fn, batch_format="pyarrow")
