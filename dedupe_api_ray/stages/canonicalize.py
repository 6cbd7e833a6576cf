"""Canonicalization (M7 †, dedupe:dedupe/convenience.py::canonicalize):
per cluster, pick the centroid-most representative value per field —
the value minimizing total affine-gap distance to the other members'
values; ties broken deterministically (first in record_id order, with
``warc_ts``/record_id as the stable tie-break the graft data model
provides).

Ray shape: entity_map joined to records → groupby(cluster_id) →
map_groups kernel (pure numpy/python per group, groups are cluster-
sized).  Feeds the dedupe-canon second pass of E1 †.
"""

from __future__ import annotations

import pandas as pd

from dedupe_api_ray.functions.kernels import normalized_affine_gap


def canonicalize_group(g: pd.DataFrame, fields: list[str]) -> pd.DataFrame:
    """One cluster's records → a single canonical row."""
    g = g.sort_values("record_id")
    out = {"cluster_id": [int(g["cluster_id"].iloc[0])],
           "n_members": [len(g)]}
    for f in fields:
        vals = [v for v in g[f].tolist() if v]
        if not vals:
            out[f] = [None]
            continue
        if len(vals) == 1:
            out[f] = [vals[0]]
            continue
        best, best_cost = None, float("inf")
        for v in vals:
            cost = sum(normalized_affine_gap(v, w) for w in vals if w != v)
            if cost < best_cost:
                best, best_cost = v, cost
        out[f] = [best]
    return pd.DataFrame(out)


def canonicalize(entity_map, records, fields: list[str],
                 num_partitions: int | None = None):
    """entity_map (record_id, cluster_id) ⋈ records → one canonical
    row per cluster."""
    import pyarrow as pa

    from dedupe_api_ray.utils import default_num_partitions

    em = entity_map.map_batches(
        lambda t: pa.table({"record_id": t["record_id"],
                            "cluster_id": t["cluster_id"]}),
        batch_format="pyarrow")
    joined = em.join(records, join_type="inner",
                     num_partitions=default_num_partitions(num_partitions),
                     on=("record_id",))

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return canonicalize_group(g, fields)

    return joined.groupby("cluster_id").map_groups(fn, batch_format="pandas")
