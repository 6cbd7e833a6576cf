"""Gap-based sessionization over an event log.

The classic log-pipeline windowing op the tumbling-window aggregate
does not cover: events of one user belong to the same session while
consecutive gaps are <= ``gap``; a strictly larger gap starts a new
session.  Session ids are 1-based per user in time order, so output is
deterministic and SQL-comparable (``sum(brk) OVER (PARTITION BY user
ORDER BY ts, event_id)``).

Ray shape (the same partition-kernel pattern as
stages/clustering._cluster_partition): hash-partition by user id, ONE
``map_groups`` call per partition, all per-user segmentation done with
one lexsort + reduceat inside the kernel — no per-user Python.  Users
never split across partitions, so the result is independent of
parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _sessionize_partition(g: pd.DataFrame, gap_us: int) -> pd.DataFrame:
    empty = pd.DataFrame({
        "user_id": pd.Series(dtype=np.int64),
        "session_id": pd.Series(dtype=np.int64),
        "n_events": pd.Series(dtype=np.int64),
        "sum_value_cents": pd.Series(dtype=np.int64),
        "session_start": pd.Series(dtype="datetime64[us]"),
        "session_end": pd.Series(dtype="datetime64[us]")})
    if len(g) == 0:
        return empty
    uid = g["user_id"].to_numpy().astype(np.int64, copy=False)
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    eid = g["event_id"].to_numpy().astype(np.int64, copy=False)
    val = g["value"].to_numpy().astype(np.float64)
    order = np.lexsort((eid, ts, uid))
    u, t, v = uid[order], ts[order], val[order]
    new_user = np.r_[True, u[1:] != u[:-1]]
    gap_break = np.r_[False, (t[1:] - t[:-1]) > gap_us]
    brk = new_user | gap_break
    sess_global = np.cumsum(brk)
    first_idx = np.flatnonzero(new_user)
    base = np.repeat(sess_global[first_idx],
                     np.diff(np.r_[first_idx, len(u)]))
    sess_in_user = sess_global - base + 1
    s_starts = np.flatnonzero(brk)
    n = np.diff(np.r_[s_starts, len(u)])
    sums = np.add.reduceat(v, s_starts)
    t_start = t[s_starts]
    t_end = t[s_starts + n - 1]  # t ascends within a session
    return pd.DataFrame({
        "user_id": u[s_starts],
        "session_id": sess_in_user[s_starts],
        "n_events": n.astype(np.int64),
        # half-AWAY-FROM-ZERO cents (sign-aware), matching DuckDB's
        # round(): np.round is banker's (half-to-even) and diverges by
        # 1 cent whenever a session sum lands exactly on a half-cent
        "sum_value_cents": (np.sign(sums)
                            * np.floor(np.abs(sums) * 100.0 + 0.5)
                            ).astype(np.int64),
        "session_start": t_start.astype("datetime64[us]"),
        "session_end": t_end.astype("datetime64[us]")})


def sessionize(events: ray.data.Dataset, gap_minutes: float = 30.0,
               num_partitions: int | None = None) -> ray.data.Dataset:
    """events (event_id, ts, user_id, value) → one row per session:
    (user_id, session_id, n_events, sum_value_cents, session_start,
    session_end)."""
    from dedupe_api_ray.utils import shuffle_partitions
    n_parts = shuffle_partitions(num_partitions)
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def add_part(t: pa.Table) -> pa.Table:
        # pd.util.hash_array, NOT (uid * C) % n: the multiply is a
        # bijection mod 2^m so partition id would be a pure function
        # of uid mod n_parts — strided user ids (sharded allocators)
        # would collapse into one partition.  Output is partition-
        # invariant either way (tested), so this only changes layout.
        from dedupe_api_ray.stages.asof import _key_partition
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        part = _key_partition(uid, n_parts)
        return t.append_column("__part", pa.array(part, pa.int64()))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        return _sessionize_partition(g, gap_us)

    return events.map_batches(add_part, batch_format="pyarrow") \
        .groupby("__part", num_partitions=n_parts) \
        .map_groups(kernel, batch_format="pandas")
