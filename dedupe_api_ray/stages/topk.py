"""Global top-k without a full sort shuffle.

``ds.sort(cols).limit(k)`` moves EVERY row through Ray's all-to-all
range shuffle to keep k of them.  The global top-k is contained in
the union of each block's own top-k, so pruning per batch first
bounds what the final exact sort sees to at most k rows per input
block — at 100 TB that is the difference between shuffling the corpus
and shuffling kilobytes.  The final ``sort().limit(k)`` over the
pruned remnant keeps the result EXACT and totally ordered; callers
that need a deterministic total order should include a unique
tie-break column, same as SQL ``ORDER BY ... LIMIT``.

Nulls: rows with a null in ANY sort column are excluded up front —
Ray's distributed sort places NaN inconsistently under ``descending``
(observed: NaN between 3.0 and 2.0), so keeping them would make the
result depend on block layout.  With nulls excluded the result equals
SQL ``ORDER BY ... LIMIT k`` under NULLS LAST whenever at least k
non-null rows exist; with fewer, all non-null rows are returned (SQL
would backfill null-keyed rows).
"""

from __future__ import annotations

import pandas as pd
import ray.data


def global_topk(ds: ray.data.Dataset, sort_cols: list[str], k: int,
                descending: bool | list[bool] = False
                ) -> ray.data.Dataset:
    """The k first rows of ``ds`` under ``ORDER BY sort_cols`` —
    exact, totally ordered, with only per-block top-ks shuffled."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    desc = [descending] * len(sort_cols) \
        if isinstance(descending, bool) else list(descending)
    if len(desc) != len(sort_cols):
        raise ValueError("descending must be a bool or match sort_cols")
    asc = [not d for d in desc]

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=sort_cols)
        if len(df) <= k:
            return df
        return df.sort_values(sort_cols, ascending=asc, kind="stable") \
            .head(k)

    return ds.map_batches(prune, batch_format="pandas") \
        .sort(sort_cols, descending=desc).limit(k)
