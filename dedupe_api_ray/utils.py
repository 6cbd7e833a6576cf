"""Small shared helpers."""

from __future__ import annotations

import ray


def default_num_partitions(requested: int | None = None,
                           reserve: int = 2) -> int:
    """Partition count for hash joins/shuffles that leaves CPUs free
    for upstream stages.  ``Dataset.join`` reserves one aggregator
    actor per wave of partitions; asking for more partitions than
    (cluster CPUs - reserve) can deadlock a small local session (the
    aggregators starve the producers), so joins should never default
    to a fixed large number."""
    if requested is not None:
        return max(2, requested)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, cpus - reserve)


def shuffle_partitions(requested: int | None = None) -> int:
    """Output-partition count for hot groupby/map_groups shuffles.
    Ray's sort-based groupby otherwise inherits the upstream block
    count (often ~the number of read tasks), which caps map_groups
    parallelism far below the CPU count."""
    if requested is not None:
        return max(2, requested)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(8, cpus * 2)


def actor_pool(min_actors: int = 1, max_cap: int | None = None
               ) -> tuple[int, int]:
    """Default (min, max) for stateful map_batches actor pools: max
    scales with the cluster's CPU count instead of a hard-coded 8 —
    a fixed cap silently serializes the stage on bigger clusters (a
    32-CPU session ran Fingerprinter on 8 actors, so the stage's wall
    was identical at 8 and 32 CPUs and strong-scaling efficiency paid
    the whole stage as serial floor)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    hi = max(8, cpus)
    if max_cap is not None:
        hi = min(hi, max_cap)
    return (min_actors, max(min_actors, hi))


def round_half_away(x, ndigits: int = 6):
    """Decimal rounding with ties AWAY from zero — the SQL (DuckDB /
    ANSI) convention.  np.round is banker's (half-to-even) and silently
    diverges by one ulp-of-decimal whenever a value lands exactly on a
    half at the target digit (e.g. jaccard 77/128 at 6 dp), breaking
    engine-vs-oracle hash parity."""
    import numpy as np
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def should_broadcast(ds: "ray.data.Dataset", max_rows: int = 2_000_000,
                     max_bytes: int = 1 << 30) -> bool:
    """Small-side payload routing: broadcast (one ``ray.put``, probed
    in every task) only if the dataset is small by BYTES as well as by
    rows.  Bytes are the binding constraint — 2M long web pages are
    several GiB in one object against a default ~30%-of-RAM object
    store — and the row bound is the fallback when Ray cannot estimate
    a size for the plan.  Callers fall back to a two-sided hash join
    when this returns False."""
    try:
        nb = ds.size_bytes()
    except Exception:
        nb = None
    if nb is not None and nb > max_bytes:
        return False
    return ds.count() <= max_rows
