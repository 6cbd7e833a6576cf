"""Vendored pure-Python mini-oracle of the reference engine semantics.

Implements the dedupe partition flow (block → pair → score → union-find
→ centroid hierarchical clustering cut → confidences; dedupe:dedupe/
api.py::Dedupe.partition †, clustering.py::cluster / condensedDistance /
confidences †) with plain dict/loop code, deliberately independent of
the vectorized/distributed engine:

- scalar kernels (kernels.affine_gap / cosine_similarity / jaccard),
- per-record predicate evaluation,
- driver union-find,
- an O(n^3) pure-Python centroid-linkage (Lance-Williams on squared
  distances, merge height = sqrt(d2)) + the fcluster 'distance'
  criterion (maximal subtrees whose max link height <= 1-threshold).

Golden fixture files are produced from this oracle; the engine must
match it at pairwise F1 >= 0.99 (BASELINE.md).  When /root/reference is
populated, regenerate goldens from the real library and diff
(SURVEY.md §0 protocol).
"""

from __future__ import annotations

import math

from dedupe_api_ray.functions import kernels
from dedupe_api_ray.model import Model, _normalize_record, _record_keys, PredicateSpec


def oracle_canopy(records: dict[int, dict], field: str,
                  threshold: float) -> dict[int, int]:
    """Naive O(n^2) canopy oracle, independent of the engine's
    inverted-index implementation: same IDF formula, same pinned
    ascending-record_id order, direct dict-dot cosine."""
    n = len(records)
    df: dict[str, int] = {}
    tok_lists: dict[int, list[str]] = {}
    for rid in records:
        toks = records[rid].get(f"{field}__tokens")
        if toks is None:
            from dedupe_api_ray.functions.text import tokens_of
            toks = tokens_of((records[rid].get(field) or "").lower())
        tok_lists[rid] = toks
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    idf = {t: math.log(n / (1 + c)) + 1.0 for t, c in df.items()}
    vecs: dict[int, dict[str, float]] = {}
    for rid, toks in tok_lists.items():
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        v = {t: f * idf.get(t, 1.0) for t, f in tf.items()}
        norm = math.sqrt(sum(w * w for w in v.values()))
        if norm > 0:
            v = {t: w / norm for t, w in v.items()}
        vecs[rid] = v
    assigned: dict[int, int] = {}
    for rid in sorted(records):
        if rid in assigned:
            continue
        assigned[rid] = rid
        vc = vecs[rid]
        for other in sorted(records):
            if other in assigned:
                continue
            vo = vecs[other]
            small, big = (vc, vo) if len(vc) <= len(vo) else (vo, vc)
            cos = sum(w * big.get(t, 0.0) for t, w in small.items())
            if cos >= threshold:
                assigned[other] = rid
    return assigned


def oracle_block_keys(records: dict[int, dict], model: Model) -> dict[int, set[str]]:
    """pred_id-tagged block keys per record (Fingerprinter semantics †:
    keys are tagged '{pred}:{value}' so predicates never collide)."""
    out: dict[int, set[str]] = {rid: set() for rid in records}
    for i, spec in enumerate(model.predicates):
        if spec.kind == "tfidf_canopy":
            canopy = oracle_canopy(records, spec.field,
                                   spec.params.get("threshold", 0.4))
            for rid, center in canopy.items():
                out[rid].add(f"{i}:{center}")
            continue
        for rid, rec in records.items():
            for k in _record_keys(spec, rec):
                out[rid].add(f"{i}:{k}")
    return out


def oracle_pairs(block_keys: dict[int, set[str]]) -> set[tuple[int, int]]:
    by_key: dict[str, list[int]] = {}
    for rid, keys in block_keys.items():
        for k in keys:
            by_key.setdefault(k, []).append(rid)
    pairs: set[tuple[int, int]] = set()
    for members in by_key.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


def oracle_score_pair(rec_a: dict, rec_b: dict, model: Model) -> float:
    """Scalar feature vector + LR sigmoid, mirroring DataModel layout."""
    dm = model.data_model()
    x = []
    nan_flags: dict[str, bool] = {}
    for f in dm._base:
        va, vb = rec_a.get(f.field), rec_b.get(f.field)
        if f.type in ("String", "ShortString"):
            d = kernels.normalized_affine_gap(va, vb)
        elif f.type == "Text":
            d = kernels.cosine_similarity(rec_a.get(f"{f.field}__tokens"),
                                          rec_b.get(f"{f.field}__tokens"),
                                          model.idf.get(f.field))
        elif f.type == "Set":
            d = kernels.jaccard(va, vb)
        elif f.type == "Exact":
            d = float("nan") if va is None or vb is None else float(va == vb)
        elif f.type == "Price":
            d = kernels.price_distance(va, vb)
        elif f.type == "LatLong":
            d = (kernels.haversine(va[0], va[1], vb[0], vb[1])
                 if va and vb else float("nan"))
        elif f.type == "Exists":
            d = float(va not in (None, "") and vb not in (None, ""))
        elif f.type == "Categorical":
            cats = f.categories or []
            same = va == vb and va is not None
            miss = va is None or vb is None
            for j in range(len(cats) - 1):
                x.append(1.0 if same and va == cats[j + 1] else 0.0)
            nan_flags[f.name] = miss
            continue
        elif f.type == "Custom":
            d = (f.comparator(va, vb)
                 if va is not None and vb is not None else float("nan"))
        else:  # pragma: no cover
            raise ValueError(f.type)
        nan_flags[f.name] = math.isnan(d)
        x.append(0.0 if math.isnan(d) else d)
    for f in dm._interactions:
        prod = 1.0
        for parent in f.interaction_fields or []:
            pdef = next(b for b in dm._base if b.field == parent)
            prod *= x[dm._col_of[pdef.name][0]]
        x.append(prod)
    for f in dm._missing_vars:
        x.append(1.0 if nan_flags[f.name] else 0.0)
    z = sum(w * v for w, v in zip(model.weights, x)) + model.bias
    return 1.0 / (1.0 + math.exp(-z))


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id wins (component label = min id)
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def centroid_linkage(n: int, d2: dict[tuple[int, int], float]
                     ) -> list[tuple[int, int, float, int]]:
    """Pure-Python centroid linkage.  ``d2`` holds SQUARED distances
    between leaves (missing pairs default to 1.0^2 — condensedDistance
    fills unscored pairs with distance 1 †).  Returns merge rows
    (left, right, height, size) with new node ids n, n+1, ...
    Deterministic tie-break: lexicographically smallest (i, j)."""
    def get(a: int, b: int) -> float:
        if a > b:
            a, b = b, a
        return d2.get((a, b), 1.0)

    active = list(range(n))
    size = {i: 1 for i in range(n)}
    dist = {}
    for ii in range(len(active)):
        for jj in range(ii + 1, len(active)):
            a, b = active[ii], active[jj]
            dist[(a, b)] = get(a, b)
    merges: list[tuple[int, int, float, int]] = []
    nxt = n
    while len(active) > 1:
        best = None
        best_d = math.inf
        for ii in range(len(active)):
            for jj in range(ii + 1, len(active)):
                a, b = active[ii], active[jj]
                dv = dist[(a, b)]
                if dv < best_d:  # strict: first minimum in scan order
                    best_d = dv
                    best = (a, b)
        i, j = best
        ni, nj = size[i], size[j]
        h = math.sqrt(max(best_d, 0.0))
        merges.append((i, j, h, ni + nj))
        new = nxt
        nxt += 1
        for k in active:
            if k in (i, j):
                continue
            dik = dist[(min(i, k), max(i, k))]
            djk = dist[(min(j, k), max(j, k))]
            dnew = ((ni * dik + nj * djk) / (ni + nj)
                    - ni * nj * best_d / (ni + nj) ** 2)
            dist[(min(new, k), max(new, k))] = dnew
        active = [k for k in active if k not in (i, j)] + [new]
        size[new] = ni + nj
    return merges


def cut_tree(n: int, merges: list[tuple[int, int, float, int]],
             t: float) -> list[list[int]]:
    """fcluster(criterion='distance') semantics: flat clusters =
    maximal subtrees whose max link height <= t."""
    maxh: dict[int, float] = {}
    uf = UnionFind()
    for k, (i, j, h, _) in enumerate(merges):
        node = n + k
        m = h
        for child in (i, j):
            if child >= n:
                m = max(m, maxh[child])
        maxh[node] = m
    for k, (i, j, _, _) in enumerate(merges):
        node = n + k
        if maxh[node] <= t:
            uf.union(_leaf_rep(i, n, merges, uf), _leaf_rep(j, n, merges, uf))
    groups: dict[int, list[int]] = {}
    for leaf in range(n):
        groups.setdefault(uf.find(leaf), []).append(leaf)
    return list(groups.values())


def _leaf_rep(node: int, n: int, merges, uf) -> int:
    while node >= n:
        node = merges[node - n][0]
    return node


def oracle_cluster(edges: list[tuple[int, int, float]], threshold: float
                   ) -> dict[int, tuple[int, float]]:
    """dedupe:dedupe/clustering.py::cluster †: union-find over edges
    with score >= threshold (engine-wide design decision, SURVEY.md §2
    G1 note), then per-component centroid hcluster on distances
    1-score cut at 1-threshold; confidence = 1 - sqrt(mean squared
    distance to other members); 2-member clusters keep score-based
    confidence (the reference yields (score,)*2 for single-edge
    components †)."""
    kept = [(a, b, s) for a, b, s in edges if s >= threshold]
    uf = UnionFind()
    for a, b, _ in kept:
        uf.union(a, b)
    comps: dict[int, list[tuple[int, int, float]]] = {}
    for a, b, s in kept:
        comps.setdefault(uf.find(a), []).append((a, b, s))
    out: dict[int, tuple[int, float]] = {}
    for root, comp_edges in sorted(comps.items()):
        nodes = sorted({x for a, b, _ in comp_edges for x in (a, b)})
        if len(nodes) == 2:
            (a, b, s) = comp_edges[0]
            if s >= threshold:
                cid = min(a, b)
                out[a] = (cid, s)
                out[b] = (cid, s)
            continue
        index = {rid: i for i, rid in enumerate(nodes)}
        d2: dict[tuple[int, int], float] = {}
        for a, b, s in comp_edges:
            i, j = index[a], index[b]
            if i > j:
                i, j = j, i
            d2[(i, j)] = (1.0 - s) ** 2
        merges = centroid_linkage(len(nodes), d2)
        flat = cut_tree(len(nodes), merges, 1.0 - threshold)
        for group in flat:
            if len(group) < 2:
                rid = nodes[group[0]]
                out[rid] = (rid, 1.0)
                continue
            cid = min(nodes[i] for i in group)
            for i in group:
                sq = 0.0
                for j in group:
                    if i == j:
                        continue
                    a, b = min(i, j), max(i, j)
                    sq += d2.get((a, b), 1.0)
                conf = 1.0 - math.sqrt(sq / (len(group) - 1))
                out[nodes[i]] = (cid, conf)
    return out


def oracle_partition(raw_records: dict[int, dict], model: Model,
                     threshold: float = 0.5) -> dict[int, tuple[int, float]]:
    """Full E3 flow †.  Returns record_id → (cluster_id, confidence);
    singletons get (own id, 1.0)."""
    records = {rid: _normalize_record(r, model.field_defs)
               for rid, r in raw_records.items()}
    keys = oracle_block_keys(records, model)
    pairs = oracle_pairs(keys)
    edges = [(a, b, oracle_score_pair(records[a], records[b], model))
             for a, b in sorted(pairs)]
    assign = oracle_cluster(edges, threshold)
    for rid in raw_records:
        if rid not in assign:
            assign[rid] = (rid, 1.0)
    return assign
