"""Clustering: distributed connected components + per-component
centroid hierarchical clustering with confidences.

Reference (†): dedupe:dedupe/clustering.py — in-memory numpy
union_find → per-component fastcluster centroid linkage on condensed
distances (1 - score, missing pairs = 1) cut with
fcluster(criterion='distance') at 1 - threshold; confidence =
1 - sqrt(mean squared distance to the other cluster members); a
single-edge component yields the pair with (score, score).

Ray shapes:
- G1 connected components = the alternating large-star / small-star
  edge-rewriting algorithm (Kiveris et al., "Connected Components in
  MapReduce and Beyond") executed as iterative groupby/map_groups
  passes over the edge Dataset until a fixpoint checksum — the
  "distributed union-find ... iterative groupby/sort passes" of the
  north_star.  A driver-side numpy union-find fast path handles small
  edge sets (mode="auto"), mirroring how Ray Data itself shortcuts
  small shuffles.
- G2 per-component clustering = groupby(component_id).map_groups with
  a numpy Lance-Williams centroid-linkage kernel; components larger
  than ``max_cluster_size`` fall back to transitive closure only
  (SURVEY.md §4.3 oversized-component cap — deterministic, logged).

Determinism: component label = min(record_id) in the component and
cluster_id = min(record_id) in the flat cluster, so output is
invariant across parallelism levels (SURVEY.md §4.6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


# ---------------------------------------------------------------------------
# G1: connected components
# ---------------------------------------------------------------------------

def _checksum(edges: ray.data.Dataset) -> tuple[int, int, int]:
    """Order-independent (sum, xor, count) signature of the edge SET.
    Each edge is mixed through a splitmix64-style avalanche so equal
    signatures imply equal sets up to a ~2^-125 collision probability
    (the convergence test below turns a collision into a silently
    wrong star forest, so a 31-bit sum was not enough)."""
    def chk(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            z = u * np.uint64(0x9E3779B97F4A7C15) + v
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            z ^= z >> np.uint64(31)
        s = int(z.sum(dtype=np.uint64))  # wrapping sum mod 2^64
        x = int(np.bitwise_xor.reduce(z)) if len(z) else 0
        return pa.table({"s": pa.array([s & 0x7FFFFFFFFFFFFFFF], pa.int64()),
                         "x": pa.array([x & 0x7FFFFFFFFFFFFFFF], pa.int64()),
                         "n": pa.array([len(u)], pa.int64())})
    t = edges.map_batches(chk, batch_format="pyarrow").to_pandas()
    return (int(t["s"].sum()) & 0x7FFFFFFFFFFFFFFF,
            int(np.bitwise_xor.reduce(t["x"].to_numpy().astype(np.uint64)))
            if len(t) else 0,
            int(t["n"].sum()))


def _distinct_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    from dedupe_api_ray.stages.blocking import distinct_pairs
    return distinct_pairs(edges, col_a="u", col_b="v")


def _symmetrize(batch: pa.Table) -> pa.Table:
    u = batch["u"].combine_chunks() if isinstance(batch["u"], pa.ChunkedArray) else batch["u"]
    v = batch["v"].combine_chunks() if isinstance(batch["v"], pa.ChunkedArray) else batch["v"]
    return pa.table({"u": pa.concat_arrays([u, v]), "v": pa.concat_arrays([v, u])})


def _orient_high_low(batch: pa.Table) -> pa.Table:
    u = batch["u"].to_numpy(zero_copy_only=False)
    v = batch["v"].to_numpy(zero_copy_only=False)
    hi = np.maximum(u, v)
    lo = np.minimum(u, v)
    keep = hi != lo
    return pa.table({"u": pa.array(hi[keep]), "v": pa.array(lo[keep])})


def _min_neighbor(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(u, v) → (u, mn) where mn = min neighbor of u.  Pre-aggregated
    inside map_batches (partial min per key per batch) before the
    groupby so the shuffle moves one row per (key, batch), not per
    edge — the partial/combiner rule from SURVEY.md §4."""
    def partial(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        order = np.argsort(u, kind="stable")
        us, vs = u[order], v[order]
        uniq, starts = np.unique(us, return_index=True)
        mins = np.minimum.reduceat(vs, starts)
        return pa.table({"u": pa.array(uniq), "v": pa.array(mins)})

    from dedupe_api_ray.utils import shuffle_partitions
    mins = edges.map_batches(partial, batch_format="pyarrow") \
        .groupby("u", num_partitions=shuffle_partitions()).min("v")
    return mins.map_batches(
        lambda t: t.rename_columns(["u", "mn"]), batch_format="pyarrow")


def connected_components_distributed(edges: ray.data.Dataset,
                                     max_iterations: int = 50,
                                     num_partitions: int | None = None
                                     ) -> ray.data.Dataset:
    """edges (u, v) → labels (record_id, component_id), component_id =
    min record_id of the component.

    Alternating large-star / small-star (Kiveris et al.), each pass
    fully vectorized: a groupby-min computes each node's minimum
    neighbor, a hash join attaches it back to the edges, and a
    map_batches rewrites them — no per-node Python groups.  Iterates
    until the distinct-edge-set checksum reaches a fixpoint
    (O(log^2 n) passes)."""
    from dedupe_api_ray.utils import default_num_partitions
    num_partitions = default_num_partitions(num_partitions)
    cur = _distinct_edges(edges.map_batches(_orient_high_low,
                                            batch_format="pyarrow"))
    prev_sig = None
    converged = False
    for _ in range(max_iterations):
        # ---- large-star: for each u, connect larger neighbors to
        # m = min(N(u) ∪ {u}); every edge is emitted from its lower
        # endpoint's neighborhood, so no edge is lost.
        sym = cur.map_batches(_symmetrize, batch_format="pyarrow")
        mins = _min_neighbor(sym)
        joined = sym.join(mins, join_type="inner",
                          num_partitions=num_partitions, on=("u",))

        def large_rewrite(batch: pa.Table) -> pa.Table:
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            mn = np.minimum(batch["mn"].to_numpy(zero_copy_only=False), u)
            keep = v > u
            return pa.table({"u": pa.array(v[keep]), "v": pa.array(mn[keep])})

        ls = _distinct_edges(
            joined.map_batches(large_rewrite, batch_format="pyarrow")
            .map_batches(_orient_high_low, batch_format="pyarrow"))

        # ---- small-star: edges oriented high→low; connect all
        # neighbors (plus u) to the minimum neighbor.
        mins2 = _min_neighbor(ls)
        joined2 = ls.join(mins2, join_type="inner",
                          num_partitions=num_partitions, on=("u",))

        def small_rewrite(batch: pa.Table) -> pa.Table:
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            mn = batch["mn"].to_numpy(zero_copy_only=False)
            keep = v != mn
            out_u = np.concatenate([v[keep], u])
            out_v = np.concatenate([mn[keep], mn])
            return pa.table({"u": pa.array(out_u), "v": pa.array(out_v)})

        cur = _distinct_edges(
            joined2.map_batches(small_rewrite, batch_format="pyarrow")
            .map_batches(_orient_high_low, batch_format="pyarrow"))
        cur = cur.materialize()
        sig = _checksum(cur)
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # to_labels below ASSUMES a converged star forest; labelling a
        # non-fixpoint edge set splits true components silently, so a
        # cap exhaust must be loud (Kiveris bounds passes at O(log^2 n)
        # — 50 covers any realistic graph, but a pathological chain or
        # a caller-lowered cap must not produce wrong entities).
        raise RuntimeError(
            f"connected_components_distributed: no fixpoint after "
            f"{max_iterations} large/small-star rounds; raise "
            "max_iterations (labels from an unconverged edge set "
            "would split components)")

    # converged: every edge is (node, root); roots get self-labels
    def to_labels(batch: pa.Table) -> pa.Table:
        u = batch["u"].combine_chunks() if isinstance(batch["u"], pa.ChunkedArray) else batch["u"]
        v = batch["v"].combine_chunks() if isinstance(batch["v"], pa.ChunkedArray) else batch["v"]
        return pa.table({"record_id": pa.concat_arrays([u, v]),
                         "component_id": pa.concat_arrays([v, v])})

    labels = cur.map_batches(to_labels, batch_format="pyarrow")
    return labels.groupby("record_id").min("component_id") \
        .map_batches(lambda t: t.rename_columns(["record_id", "component_id"]),
                     batch_format="pyarrow")


def connected_components_driver(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Small-edge-set fast path on the driver: vectorized min-label
    propagation with pointer jumping (Shiloach-Vishkin shape) instead
    of a Python-loop union-find — the loop cost at ~1M edges was
    seconds of single-threaded find() chasing.  Each round every edge
    pulls both endpoints to their min label (np.minimum.at), then
    labels are compressed by repeated ``labels = labels[labels]``;
    converges in O(log n) rounds, all O(E) numpy."""
    tbl = pa.concat_tables(list(edges.select_columns(["u", "v"])
                                .iter_batches(batch_format="pyarrow",
                                              batch_size=1 << 20)))
    u = tbl["u"].to_numpy(zero_copy_only=False)
    v = tbl["v"].to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    iu, iv = inv[: len(u)], inv[len(u):]
    labels = np.arange(len(nodes))
    while True:
        m = np.minimum(labels[iu], labels[iv])
        np.minimum.at(labels, iu, m)
        np.minimum.at(labels, iv, m)
        while True:  # pointer jumping to the current roots
            nl = labels[labels]
            if np.array_equal(nl, labels):
                break
            labels = nl
        if np.array_equal(labels[iu], labels[iv]):
            break
    # label = min node index in component; nodes sorted asc, so the
    # component label maps to the min record_id.
    comp = nodes[labels]
    return ray.data.from_arrow(pa.table({
        "record_id": pa.array(nodes, pa.int64()),
        "component_id": pa.array(comp, pa.int64()),
    }))


def connected_components(edges: ray.data.Dataset, mode: str = "auto",
                         driver_limit: int = 20_000_000,
                         n_edges: int | None = None) -> ray.data.Dataset:
    """edges dataset with columns (u, v).

    ``driver_limit``: max edges for the driver fast path — 20M edges
    is ~320 MB of int64 pairs plus the np.unique working set, well
    within a head node's heap, and the vectorized label propagation
    handles it in seconds where the distributed large/small-star path
    pays several shuffle rounds.  Beyond it (true web-scale candidate
    graphs) the distributed path takes over.

    ``n_edges``: caller-known edge count for the auto routing.  When
    ``edges`` is a lazy projection of an already-counted dataset,
    passing the count here avoids a full extra execution of that
    projection (``edges.count()`` cannot use metadata through a
    map_batches)."""
    if mode == "driver":
        return connected_components_driver(edges)
    if mode == "distributed":
        return connected_components_distributed(edges)
    n = edges.count() if n_edges is None else n_edges
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "record_id": pa.array([], pa.int64()),
            "component_id": pa.array([], pa.int64())}))
    if n <= driver_limit:
        return connected_components_driver(edges)
    return connected_components_distributed(edges)


# ---------------------------------------------------------------------------
# G2: per-component centroid hierarchical clustering
# ---------------------------------------------------------------------------

def centroid_linkage_np(d2: np.ndarray) -> list[tuple[int, int, float, int]]:
    """Numpy Lance-Williams centroid linkage over a full squared-
    distance matrix.  Returns merge rows (left_node, right_node,
    height=sqrt(d2), size); new nodes numbered n, n+1, …  Ties break to
    the lexicographically smallest (node_id_lo, node_id_hi) among the
    minimal distances — the SAME canonical key as oracle
    .centroid_linkage, so engine and oracle dendrograms are identical
    even on all-tied unscored blocks (d2 = 1.0)."""
    n = d2.shape[0]
    work = d2.astype(np.float64).copy()
    np.fill_diagonal(work, np.inf)
    sizes = np.ones(n, dtype=np.int64)
    node_ids = np.arange(n)
    active = np.ones(n, dtype=bool)
    # cached per-row min + argmin: the previous version scanned the
    # FULL matrix twice per step (work.min() + argwhere), which is
    # O(n^3) memory traffic — ~4 s for one n=1000 component, and such
    # near-cap components straggle a whole clustering partition.  With
    # lazy row-min repair each step is O(n) plus amortized repairs:
    # measured ~50x faster at n=1000, identical merges and tie-breaks
    # (the candidate scan below enumerates ALL pairs achieving the
    # global min, exactly like the old argwhere).
    rowmin = work.min(axis=1)
    rowarg = np.argmin(work, axis=1)
    merges: list[tuple[int, int, float, int]] = []
    for step in range(n - 1):
        d2ij = rowmin[active].min()
        rows = np.flatnonzero(active & (rowmin == d2ij))
        ci_parts: list[np.ndarray] = []
        cj_parts: list[np.ndarray] = []
        for r in rows:
            cols = np.flatnonzero(work[r] == d2ij)
            ci_parts.append(np.full(len(cols), r, dtype=np.int64))
            cj_parts.append(cols)
        ci = np.concatenate(ci_parts)
        cj = np.concatenate(cj_parts)
        upper = ci < cj
        ci, cj = ci[upper], cj[upper]
        na, nb = node_ids[ci], node_ids[cj]
        lo = np.minimum(na, nb)
        hi = np.maximum(na, nb)
        k = int(np.lexsort((hi, lo))[0])
        i, j = int(ci[k]), int(cj[k])
        ni, nj = sizes[i], sizes[j]
        h = float(np.sqrt(max(d2ij, 0.0)))
        merges.append((int(lo[k]), int(hi[k]), h, int(ni + nj)))
        new_row = ((ni * work[i, :] + nj * work[j, :]) / (ni + nj)
                   - ni * nj * d2ij / (ni + nj) ** 2)
        work[i, :] = new_row
        work[:, i] = new_row
        work[i, i] = np.inf
        work[j, :] = np.inf
        work[:, j] = np.inf
        sizes[i] = ni + nj
        node_ids[i] = n + step
        active[j] = False
        # ---- row-min cache repair ----
        col_i = work[:, i]  # post-update (work[j, i] is already inf)
        need = active & ((rowarg == i) | (rowarg == j))
        need[i] = False
        better = active & ~need & (col_i < rowmin)
        better[i] = False
        rowmin[better] = col_i[better]
        rowarg[better] = i
        for r in np.flatnonzero(need):
            rowmin[r] = work[r].min()
            rowarg[r] = int(np.argmin(work[r]))
        rowmin[i] = work[i].min()
        rowarg[i] = int(np.argmin(work[i]))
        rowmin[j] = np.inf
    return merges


def cut_tree_np(n: int, merges: list[tuple[int, int, float, int]],
                t: float) -> np.ndarray:
    """fcluster(criterion='distance'): leaf → flat-cluster label;
    clusters are maximal subtrees with max link height <= t."""
    maxh = np.empty(len(merges))
    for k, (i, j, h, _) in enumerate(merges):
        m = h
        if i >= n:
            m = max(m, maxh[i - n])
        if j >= n:
            m = max(m, maxh[j - n])
        maxh[k] = m
    parent = np.arange(n + len(merges))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for k, (i, j, _, _) in enumerate(merges):
        if maxh[k] <= t:
            node = n + k
            for child in (i, j):
                ra, rb = find(child), find(node)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    labels = np.empty(n, dtype=np.int64)
    reps: dict[int, int] = {}
    for leaf in range(n):
        r = find(leaf)
        labels[leaf] = reps.setdefault(r, leaf)
    return labels


def _cluster_component_arrays(ids_a: np.ndarray, ids_b: np.ndarray,
                              scores: np.ndarray, threshold: float,
                              max_cluster_size: int
                              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One connected component of scored edges → (record_id,
    cluster_id, confidence) arrays.  numpy in/out so the partition
    kernel pays no pandas construction per component."""
    nodes = np.unique(np.concatenate([ids_a, ids_b]))
    n = len(nodes)
    if n == 2:
        s = np.float64(scores[0])
        return (nodes.astype(np.int64),
                np.full(2, nodes[0], np.int64),
                np.full(2, s, np.float64))
    ia = np.searchsorted(nodes, ids_a)
    ib = np.searchsorted(nodes, ids_b)
    if n > max_cluster_size:
        # oversized component: transitive closure only (§4.3)
        cid = int(nodes[0])
        d2 = (1.0 - scores) ** 2
        ssum = np.zeros(n)
        cnt = np.zeros(n)
        np.add.at(ssum, ia, d2)
        np.add.at(ssum, ib, d2)
        np.add.at(cnt, ia, 1)
        np.add.at(cnt, ib, 1)
        miss = (n - 1) - cnt
        conf = 1.0 - np.sqrt((ssum + miss) / (n - 1))
        return (nodes.astype(np.int64), np.full(n, cid, np.int64), conf)
    d2 = np.ones((n, n), dtype=np.float64)  # missing pairs = 1 †
    d2[ia, ib] = (1.0 - scores) ** 2
    d2[ib, ia] = (1.0 - scores) ** 2
    np.fill_diagonal(d2, 0.0)
    merges = centroid_linkage_np(d2)
    labels = cut_tree_np(n, merges, 1.0 - threshold)
    out_rid = np.empty(n, np.int64)
    out_cid = np.empty(n, np.int64)
    out_conf = np.empty(n, np.float64)
    pos = 0
    for lab in np.unique(labels):
        members = np.nonzero(labels == lab)[0]
        k = len(members)
        if k < 2:
            rid = int(nodes[members[0]])
            out_rid[pos] = rid
            out_cid[pos] = rid
            out_conf[pos] = 1.0
            pos += 1
            continue
        cid = int(nodes[members].min())
        sub = d2[np.ix_(members, members)]
        mean_sq = sub.sum(axis=1) / (k - 1)
        out_rid[pos:pos + k] = nodes[members]
        out_cid[pos:pos + k] = cid
        out_conf[pos:pos + k] = 1.0 - np.sqrt(mean_sq)
        pos += k
    return out_rid, out_cid, out_conf


class ComponentClusterer:
    """Kernel: one connected component of scored edges →
    (record_id, cluster_id, confidence) rows (pandas wrapper around
    _cluster_component_arrays, kept for direct callers/tests)."""

    def __init__(self, threshold: float, max_cluster_size: int = 1000):
        self.threshold = threshold
        self.max_cluster_size = max_cluster_size

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        rid, cid, conf = _cluster_component_arrays(
            g["id_a"].to_numpy(), g["id_b"].to_numpy(),
            g["score"].to_numpy().astype(np.float64),
            self.threshold, self.max_cluster_size)
        return pd.DataFrame({"record_id": rid, "cluster_id": cid,
                             "confidence": conf})


def _cluster_partition(g: pd.DataFrame, threshold: float,
                       max_cluster_size: int) -> pd.DataFrame:
    """One hash PARTITION of components (many components per call) →
    entity rows.  Replaces per-component ``map_groups`` (one pandas
    UDF call per component — ~1 ms × 10^5 tiny components dominated
    the clustering stage): components are segmented by one argsort,
    single-edge components (the vast majority under tight blocking)
    are emitted with one vectorized gather, and only multi-edge
    components run the linkage kernel, on numpy slices."""
    empty = pd.DataFrame({"record_id": pd.Series(dtype=np.int64),
                          "cluster_id": pd.Series(dtype=np.int64),
                          "confidence": pd.Series(dtype=np.float64)})
    if len(g) == 0:
        return empty
    comp = g["component_id"].to_numpy()
    ia = g["id_a"].to_numpy().astype(np.int64, copy=False)
    ib = g["id_b"].to_numpy().astype(np.int64, copy=False)
    sc = g["score"].to_numpy().astype(np.float64)
    order = np.lexsort((ib, ia, comp))
    comp, ia, ib, sc = comp[order], ia[order], ib[order], sc[order]
    # exact (id_a, id_b) dedup — THE global distinct point for pairs
    # produced with candidate_pairs(distinct="local"): every edge of a
    # component lands in this one partition, so dropping consecutive
    # duplicates here is a global distinct over retained edges.  Scores
    # of duplicate pairs are identical (the scorer is a pure function
    # of the two records), so keeping the first is exact; the
    # oversized-component path below uses np.add.at degree/mass sums
    # and MUST NOT see duplicates.
    if len(comp) > 1:
        keep = np.r_[True, (comp[1:] != comp[:-1]) | (ia[1:] != ia[:-1])
                     | (ib[1:] != ib[:-1])]
        if not keep.all():
            comp, ia, ib, sc = comp[keep], ia[keep], ib[keep], sc[keep]
    starts = np.flatnonzero(np.r_[True, comp[1:] != comp[:-1]])
    lens = np.diff(np.r_[starts, len(comp)])
    out_r: list[np.ndarray] = []
    out_c: list[np.ndarray] = []
    out_f: list[np.ndarray] = []
    single = starts[lens == 1]
    if len(single):
        # one edge → two nodes with cluster_id = min(id_a, id_b) and
        # confidence = the pair score — exactly the n == 2 branch of
        # _cluster_component_arrays.  np.minimum (not id_a alone): the
        # pipeline emits ordered pairs, but a direct caller with
        # unordered pairs must not silently get a non-min label.
        cid = np.minimum(ia[single], ib[single])
        out_r.append(ia[single])
        out_c.append(cid)
        out_f.append(sc[single])
        out_r.append(ib[single])
        out_c.append(cid)
        out_f.append(sc[single])
    for s, length in zip(starts[lens > 1], lens[lens > 1]):
        rid, cid, conf = _cluster_component_arrays(
            ia[s:s + length], ib[s:s + length], sc[s:s + length],
            threshold, max_cluster_size)
        out_r.append(rid)
        out_c.append(cid)
        out_f.append(conf)
    if not out_r:
        return empty
    return pd.DataFrame({"record_id": np.concatenate(out_r),
                         "cluster_id": np.concatenate(out_c),
                         "confidence": np.concatenate(out_f)})


def _attach_component_labels(kept: ray.data.Dataset,
                             labels: ray.data.Dataset) -> ray.data.Dataset:
    """Attach each retained edge's component_id via its ``id_a``
    (id_a's component == id_b's for retained edges).  Size-routed: a
    small label map (one row per matched record) broadcasts once and
    annotates map-side — a hash join here spawns a fresh
    aggregator-actor pool just to move a table the driver often
    already computed; the join stays as the scale path.  Shared by
    cluster_scored_pairs and greedy_matching (the two copies had
    started to drift)."""
    from dedupe_api_ray.utils import default_num_partitions, should_broadcast
    if should_broadcast(labels):
        ltbl = pa.concat_tables(list(labels.iter_batches(
            batch_format="pyarrow", batch_size=1 << 20)))
        lr = ltbl["record_id"].to_numpy(zero_copy_only=False)
        lc = ltbl["component_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(lr, kind="stable")
        lab_ref = ray.put((lr[order], lc[order]))

        def attach_component(t: pa.Table) -> pa.Table:
            r, c = ray.get(lab_ref)
            ids = t["id_a"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(r, ids)  # every id_a is labelled
            return t.append_column(
                "component_id", pa.array(c[pos], pa.int64()))

        return kept.map_batches(attach_component, batch_format="pyarrow")
    labels_renamed = labels.map_batches(
        lambda t: t.rename_columns(["id_a", "component_id"]),
        batch_format="pyarrow")
    return kept.join(labels_renamed, join_type="inner",
                     num_partitions=default_num_partitions(),
                     on=("id_a",))


def cluster_scored_pairs(scored: ray.data.Dataset, threshold: float = 0.5,
                         cc_mode: str = "auto",
                         max_cluster_size: int = 1000) -> ray.data.Dataset:
    """scored (id_a, id_b, score) → entity rows (record_id, cluster_id,
    confidence) for all records appearing in an above-threshold edge.
    Caller adds singletons (records with no retained edge)."""
    import os
    import time as _time
    _debug = bool(os.environ.get("DEDUPE_DEBUG_TIMING"))
    _t0 = _time.monotonic()

    def _mark(label: str) -> None:
        if _debug:
            print(f"[cluster {_time.monotonic() - _t0:7.1f}s] {label}",
                  flush=True)

    kept = scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t["score"], threshold)),
        batch_format="pyarrow")
    kept = kept.materialize()
    _mark(f"kept edges={kept.count()}")
    if os.environ.get("DEDUPE_DEBUG_STATS"):
        print(kept.stats(), flush=True)
    if kept.count() == 0:
        # empty datasets lose their schema through joins (Ray 2.49):
        # short-circuit to an empty, correctly-typed entity fragment
        return ray.data.from_arrow(pa.table({
            "record_id": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64()),
            "confidence": pa.array([], pa.float64())}))
    edges = kept.map_batches(
        lambda t: pa.table({"u": t["id_a"], "v": t["id_b"]}),
        batch_format="pyarrow")
    labels = connected_components(edges, mode=cc_mode,
                                  n_edges=kept.count()).materialize()
    _mark(f"components labelled rows={labels.count()}")
    if _debug:
        # top component sizes: the one skew signal that predicts the
        # per-component clustering wall (O(n^2)-ish linkage under
        # max_cluster_size, one straggler partition above it)
        _lt = pa.concat_tables(list(labels.iter_batches(
            batch_format="pyarrow", batch_size=1 << 20)))
        _, _cnt = np.unique(_lt["component_id"].to_numpy(
            zero_copy_only=False), return_counts=True)
        _cnt.sort()
        _mark(f"top component sizes={_cnt[-10:][::-1].tolist()} "
              f"n_components={len(_cnt)}")
    # attach component to each edge (id_a's component == id_b's for
    # retained edges).  Size-routed: a small label map (it has one row
    # per matched record) broadcasts once and annotates map-side —
    # a hash join here spawns a fresh aggregator-actor pool just to
    # move a table the driver often already computed; the join stays
    # as the scale path.
    with_comp = _attach_component_labels(kept, labels)

    # ONE group per component-hash partition, not per component: the
    # partition kernel segments components in numpy (see
    # _cluster_partition) — same results, no per-group UDF overhead
    from dedupe_api_ray.utils import shuffle_partitions
    n_parts = shuffle_partitions()

    def add_part(t: pa.Table) -> pa.Table:
        c = t["component_id"].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        part = ((c * np.uint64(0x9E3779B97F4A7C15))
                % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("__part", pa.array(part, pa.int64()))

    def cluster_part(g: pd.DataFrame) -> pd.DataFrame:
        return _cluster_partition(g, threshold, max_cluster_size)

    return with_comp.map_batches(add_part, batch_format="pyarrow") \
        .groupby("__part", num_partitions=n_parts) \
        .map_groups(cluster_part, batch_format="pandas")


# ---------------------------------------------------------------------------
# G3: greedy one-to-one matching (RecordLink; dedupe:dedupe/clustering.py::
# greedyMatching †) — accept pairs in score-desc order, each record at
# most once.  Independent per connected component, so the distributed
# shape is: CC over above-threshold pairs → per-component map_groups
# greedy sweep (a component's sweep only needs its own edges).
# ---------------------------------------------------------------------------


def _greedy_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["score", "id_a", "id_b"],
                      ascending=[False, True, True])
    taken: set[int] = set()
    keep = []
    for a, b, s in zip(g["id_a"], g["id_b"], g["score"]):
        if a in taken or b in taken:
            continue
        taken.add(a)
        taken.add(b)
        keep.append((a, b, s))
    return pd.DataFrame(keep, columns=["id_a", "id_b", "score"])


def greedy_matching(scored: ray.data.Dataset, threshold: float = 0.5,
                    cc_mode: str = "auto") -> ray.data.Dataset:
    """scored (id_a, id_b, score) → one-to-one matches above
    threshold; globally identical to a single sorted sweep because
    matches never cross connected components."""
    kept = scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t["score"], threshold)),
        batch_format="pyarrow")
    kept = kept.materialize()
    if kept.count() == 0:
        return kept
    edges = kept.map_batches(
        lambda t: pa.table({"u": t["id_a"], "v": t["id_b"]}),
        batch_format="pyarrow")
    labels = connected_components(edges, mode=cc_mode,
                                  n_edges=kept.count()).materialize()
    with_comp = _attach_component_labels(kept, labels)
    return with_comp.groupby("component_id").map_groups(
        _greedy_group, batch_format="pandas")
