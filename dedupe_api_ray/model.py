"""Field definitions, feature construction and model training.

Mirrors (†, SURVEY.md §0):
- dedupe:dedupe/datamodel.py::DataModel † — explicit, user-declared
  field definitions; ``distances()`` builds the pairwise feature
  matrix; NaN (missing) → 0 plus a trailing missing-indicator column
  per has_missing variable; Interaction columns appended last as
  products of their parents' features.
- dedupe:dedupe/labeler.py::RLRLearner † — regularized logistic
  regression on labeled pairs (we fit with plain full-batch
  Newton/gradient descent in numpy; no sklearn in the sandbox).
- dedupe:dedupe/training.py::BlockLearner † — learn the blocking rule
  as a set cover: greedily pick predicates covering the labeled match
  pairs while penalizing predicates that cover many distinct pairs.

Everything in this module is DRIVER-SIDE (small data: labeled pairs,
sampled records) — matching the reference, where training is in-process
Python.  The distributed engine only ever consumes the frozen ``Model``
artifact (pickled; shipped to actors via ``ray.put``).
"""

from __future__ import annotations

import math
import pickle
from dataclasses import dataclass, field as dc_field
from itertools import combinations

import numpy as np

from dedupe_api_ray.blocking.predicates import SIMPLE_PREDICATES, predicates_for_kind
from dedupe_api_ray.functions import kernels
from dedupe_api_ray.functions.text import normalize_str, tokens_of

FIELD_KINDS = (
    "String", "ShortString", "Text", "Exact", "Set", "Categorical",
    "Price", "LatLong", "Exists", "Interaction", "Custom",
)

# User-registered variable types (SURVEY.md §2.11): name → pairwise
# kernel fn(a, b) -> float (NaN = missing).  A registered type behaves
# like Custom but is declared once and reused by name; predicates are
# attached via blocking.predicates.register_predicate(name, fn,
# kinds=("<TypeName>",)).
VARIABLE_REGISTRY: dict[str, object] = {}


def register_variable(name: str, kernel, predicates: dict | None = None
                      ) -> None:
    """§2.11 extension surface — mirror of dedupe's plugin variable
    packages †: add a field TYPE (usable as FieldDef(type=name)) whose
    pairwise feature is ``kernel(a, b) -> float``; ``predicates`` maps
    predicate name → fn registered for this kind."""
    VARIABLE_REGISTRY[name] = kernel
    if predicates:
        from dedupe_api_ray.blocking.predicates import register_predicate
        for pname, fn in predicates.items():
            register_predicate(pname, fn, kinds=(name,))


@dataclass
class FieldDef:
    """One declared variable (dedupe:dedupe/variables/*.py †)."""

    field: str
    type: str = "String"
    has_missing: bool = False
    categories: list[str] | None = None       # Categorical
    comparator: object | None = None          # Custom: fn(a, b) -> float
    interaction_fields: list[str] | None = None  # Interaction
    name: str | None = None

    def __post_init__(self) -> None:
        if self.type not in FIELD_KINDS and self.type not in VARIABLE_REGISTRY:
            raise ValueError(f"unknown field type {self.type!r}")
        if self.name is None:
            self.name = f"{self.field}:{self.type}"


@dataclass
class PredicateSpec:
    """One entry of the learned blocking union.  kind:
    - "simple":   (name, field) from the predicate registry
    - "compound": cross-product of two simple specs' keys (P19)
    - "tfidf_canopy": corpus-level TF-IDF canopy (P20), params holds
      the threshold; evaluated by the canopy stage, not per-record.
    """

    kind: str
    field: str
    name: str = ""
    params: dict = dc_field(default_factory=dict)
    parts: tuple = ()  # for compound: two (name, field) tuples

    @property
    def pred_id(self) -> str:
        if self.kind == "compound":
            (n1, f1), (n2, f2) = self.parts
            return f"({n1}:{f1})+({n2}:{f2})"
        if self.kind == "tfidf_canopy":
            return f"TfidfCanopy:{self.params.get('threshold')}:{self.field}"
        return f"{self.name}:{self.field}"


class DataModel:
    """Turns records + field defs into pairwise feature vectors.

    Feature layout (dedupe:dedupe/datamodel.py::DataModel.distances †):
    [base variable distances..., categorical dummies..., interaction
    products..., missing indicators...].  NaNs are zeroed after the
    missing indicators are derived.
    """

    def __init__(self, field_defs: list[FieldDef],
                 idf: dict[str, dict[str, float]] | None = None):
        self.field_defs = list(field_defs)
        self.idf = idf or {}  # field -> token -> idf weight (Text cosine)
        self._base = [f for f in self.field_defs if f.type != "Interaction"]
        self._interactions = [f for f in self.field_defs if f.type == "Interaction"]
        self.feature_names: list[str] = []
        self._col_of: dict[str, list[int]] = {}
        col = 0
        for f in self._base:
            n = len(f.categories) - 1 if f.type == "Categorical" else 1
            self._col_of[f.name] = list(range(col, col + n))
            for k in range(n):
                self.feature_names.append(f.name if n == 1 else f"{f.name}[{k}]")
            col += n
        for f in self._interactions:
            cols: list[int] = []
            for parent in f.interaction_fields or []:
                pdef = next(b for b in self._base if b.field == parent)
                cols.append(self._col_of[pdef.name][0])
            self._col_of[f.name] = [col]
            self.feature_names.append(f.name)
            self._interaction_parents = getattr(self, "_interaction_parents", {})
            self._interaction_parents[f.name] = cols
            col += 1
        self._missing_vars = [f for f in self._base if f.has_missing]
        for f in self._missing_vars:
            self.feature_names.append(f"{f.name}:missing")

    @property
    def n_features(self) -> int:
        return len(self.feature_names)

    def distances(self, recs_a: dict[str, list], recs_b: dict[str, list],
                  precomputed: dict[str, np.ndarray] | None = None,
                  n: int | None = None) -> np.ndarray:
        """Feature matrix for n pairs.  ``recs_a``/``recs_b`` map field
        name → list of n values (plus optional ``<field>__tokens``
        columns holding pre-tokenized lists for Text fields).
        ``precomputed`` maps a field name to an already-computed
        distance column (e.g. the scorer's cached-cosine fast path) —
        values must equal what the kernel here would produce.
        ``n`` (pair count) must be passed explicitly when EVERY
        feature arrives precomputed and no raw column is shipped —
        the Text-only sidecar case, where recs_a is empty."""
        if n is None:
            if recs_a:
                n = len(next(iter(recs_a.values())))
            elif precomputed:
                n = len(next(iter(precomputed.values())))
            else:
                raise ValueError("distances(): no raw columns, no "
                                 "precomputed columns and no explicit n")
        base_width = sum(len(self._col_of[f.name]) for f in self._base)
        x = np.zeros((n, self.n_features), dtype=np.float64)
        col = 0
        nan_mask: dict[str, np.ndarray] = {}
        for f in self._base:
            # .get: a Text field whose distance arrives precomputed
            # (TF-sidecar cosine) ships no raw column with the pairs
            a = recs_a.get(f.field)
            b = recs_b.get(f.field)
            if f.type in ("String", "ShortString"):
                d = kernels.normalized_affine_gap_batch(a, b)
                x[:, col] = d
                nan_mask[f.name] = np.isnan(d)
                col += 1
            elif f.type == "Text":
                if precomputed is not None and f.field in precomputed:
                    d = precomputed[f.field]
                else:
                    if a is None or b is None:
                        raise ValueError(
                            f"Text field {f.field!r} has neither a raw "
                            "column nor a precomputed distance — it was "
                            "excluded from the pair payload without a "
                            "TF sidecar")
                    ta = recs_a.get(f"{f.field}__tokens")
                    tb = recs_b.get(f"{f.field}__tokens")
                    if ta is None:
                        ta = [tokens_of(v) for v in a]
                    if tb is None:
                        tb = [tokens_of(v) for v in b]
                    d = kernels.cosine_similarity_batch(ta, tb,
                                                        self.idf.get(f.field))
                x[:, col] = d
                nan_mask[f.name] = np.isnan(d)
                col += 1
            elif f.type == "Set":
                d = kernels.jaccard_batch(a, b)
                x[:, col] = d
                nan_mask[f.name] = np.isnan(d)
                col += 1
            elif f.type == "Exact":
                d = kernels.exact_batch(a, b)
                x[:, col] = d
                nan_mask[f.name] = np.isnan(d)
                col += 1
            elif f.type == "Price":
                d = kernels.price_distance_batch(
                    np.array([v if v is not None else np.nan for v in a]),
                    np.array([v if v is not None else np.nan for v in b]))
                x[:, col] = d
                nan_mask[f.name] = np.isnan(d)
                col += 1
            elif f.type == "LatLong":
                lat_a = np.array([v[0] if v else np.nan for v in a])
                lon_a = np.array([v[1] if v else np.nan for v in a])
                lat_b = np.array([v[0] if v else np.nan for v in b])
                lon_b = np.array([v[1] if v else np.nan for v in b])
                d = kernels.haversine_batch(lat_a, lon_a, lat_b, lon_b)
                x[:, col] = d
                nan_mask[f.name] = np.isnan(d)
                col += 1
            elif f.type == "Exists":
                pa_ = np.array([v not in (None, "") for v in a], dtype=np.float64)
                pb_ = np.array([v not in (None, "") for v in b], dtype=np.float64)
                x[:, col] = pa_ * pb_  # both present
                nan_mask[f.name] = np.zeros(n, dtype=bool)
                col += 1
            elif f.type == "Categorical":
                cats = f.categories or []
                k = len(cats) - 1
                same = np.array([va == vb and va is not None for va, vb in zip(a, b)])
                miss = np.array([va is None or vb is None for va, vb in zip(a, b)])
                for j in range(k):
                    # dummy j: both sides equal category j+1 (k-1 dummies †)
                    x[:, col + j] = same & np.array([va == cats[j + 1] for va in a])
                m = np.zeros(n, dtype=bool)
                m |= miss
                nan_mask[f.name] = m
                col += k
            elif f.type == "Custom" or f.type in VARIABLE_REGISTRY:
                cmp_fn = (f.comparator if f.type == "Custom"
                          else VARIABLE_REGISTRY[f.type])
                d = np.array([cmp_fn(va, vb) if va is not None and vb is not None
                              else np.nan for va, vb in zip(a, b)], dtype=np.float64)
                x[:, col] = d
                nan_mask[f.name] = np.isnan(d)
                col += 1
            else:  # pragma: no cover
                raise ValueError(f.type)
        assert col == base_width
        for f in self._interactions:
            cols = self._interaction_parents[f.name]
            prod = np.ones(n, dtype=np.float64)
            for c in cols:
                prod = prod * np.nan_to_num(x[:, c])
            x[:, col] = prod
            col += 1
        for f in self._missing_vars:
            x[:, col] = nan_mask[f.name].astype(np.float64)
            col += 1
        np.nan_to_num(x, copy=False)  # K10: NaN→0 after indicators
        return x


@dataclass
class Model:
    """The frozen 'settings' artifact (dedupe:dedupe/api.py::
    write_settings / StaticDedupe †): field defs + learned predicate
    union + classifier weights (+ IDF stats for Text cosine)."""

    field_defs: list[FieldDef]
    predicates: list[PredicateSpec]
    weights: np.ndarray
    bias: float
    idf: dict[str, dict[str, float]] = dc_field(default_factory=dict)
    version: str = "model/1"

    def data_model(self) -> DataModel:
        return DataModel(self.field_defs, self.idf)

    classifier: object = None  # swappable sklearn-like predict_proba
    # (dedupe exposes a swappable `classifier` attribute †; anything
    # picklable with predict_proba(X) -> (n, 2) or (n,) works)

    def predict_proba(self, x: np.ndarray) -> np.ndarray:
        if self.classifier is not None:
            p = self.classifier.predict_proba(x)
            p = np.asarray(p)
            return p[:, 1] if p.ndim == 2 else p
        z = x @ self.weights + self.bias
        return 1.0 / (1.0 + np.exp(-z))

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def load(path: str) -> "Model":
        with open(path, "rb") as f:
            return pickle.load(f)


def fit_logistic_regression(x: np.ndarray, y: np.ndarray, alpha: float = 0.1,
                            max_iter: int = 200, tol: float = 1e-8
                            ) -> tuple[np.ndarray, float]:
    """L2-regularized LR via Newton's method (RLRLearner analog †)."""
    n, d = x.shape
    xb = np.hstack([x, np.ones((n, 1))])
    w = np.zeros(d + 1)
    reg = alpha * np.eye(d + 1)
    reg[-1, -1] = 0.0  # don't regularize the bias
    for _ in range(max_iter):
        z = xb @ w
        p = 1.0 / (1.0 + np.exp(-z))
        g = xb.T @ (p - y) + reg @ w
        s = np.clip(p * (1 - p), 1e-9, None)
        h = (xb * s[:, None]).T @ xb + reg
        try:
            step = np.linalg.solve(h, g)
        except np.linalg.LinAlgError:
            step = g * 0.01
        w -= step
        if np.abs(step).max() < tol:
            break
    return w[:-1], float(w[-1])


def compute_idf(token_lists: list[list[str]]) -> dict[str, float]:
    """Smooth IDF over a token-list corpus: log(N / (1 + df)) + 1.
    (simplecosine builds IDF weights from the supplied corpus †; the
    exact smoothing there is unverifiable with the reference absent —
    this formula is pinned engine-wide and mirrored in the oracle.)"""
    n = len(token_lists)
    df: dict[str, int] = {}
    for toks in token_lists:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    return {t: math.log(n / (1 + c)) + 1.0 for t, c in df.items()}


# ---------------------------------------------------------------------------
# Blocking learner (greedy set cover; dedupe:dedupe/training.py †)
# ---------------------------------------------------------------------------


def _record_keys(spec: PredicateSpec, rec: dict) -> set[str]:
    """Evaluate a simple/compound predicate on one record dict whose
    values are already normalized (tokens under ``<field>__tokens``)."""
    if spec.kind == "simple":
        fn, wants_tokens, _ = SIMPLE_PREDICATES[spec.name]
        v = rec.get(spec.field)
        if v in (None, ""):
            return set()
        if wants_tokens:
            return set(fn(v, rec.get(f"{spec.field}__tokens")))
        return set(fn(v))
    if spec.kind == "compound":
        (n1, f1), (n2, f2) = spec.parts
        k1 = _record_keys(PredicateSpec("simple", f1, n1), rec)
        if not k1:
            return set()
        k2 = _record_keys(PredicateSpec("simple", f2, n2), rec)
        return {f"{a}|{b}" for a in k1 for b in k2}
    raise ValueError(spec.kind)


def candidate_simple_predicates(
        field_defs: list[FieldDef]) -> list[PredicateSpec]:
    """Every registry predicate applicable to each declared field —
    the candidate set ``learn_predicates`` scores (and the set
    ``stages.audit.audit_predicates`` measures at corpus scale)."""
    out: list[PredicateSpec] = []
    for f in field_defs:
        if f.type == "Interaction":
            continue
        kind = f.type if (f.type in ("Set", "Price", "LatLong")
                          or f.type in VARIABLE_REGISTRY) else (
            "Text" if f.type == "Text" else "String")
        for name in predicates_for_kind(kind):
            if name == "existsPredicate":
                continue
            out.append(PredicateSpec("simple", f.field, name))
    return out


def learn_predicates(records: dict[int, dict], matches: list[tuple[int, int]],
                     field_defs: list[FieldDef], max_predicates: int = 4,
                     use_compound: bool = True,
                     recall_target: float = 1.0,
                     key_stats: dict[str, float] | None = None,
                     audit_fn=None) -> list[PredicateSpec]:
    """Greedy ε-cover (dedupe:dedupe/training.py::BlockLearner †):
    candidate predicates = every registry predicate applicable to each
    declared field (plus pairwise compounds of the best simples); pick
    the union that covers ≥ recall_target of labeled match pairs,
    greedily by (newly covered matches) / (estimated blocked pairs).
    Driver-side on sampled/labeled data, like the reference.

    ``key_stats`` (pred_id → candidate pairs, from
    ``stages.audit.audit_predicates`` + ``key_stats_of`` over the FULL
    corpus) replaces the sample pair-cost estimate: a sample
    systematically under-costs fixed-cardinality predicates (a
    url_host key looks like singleton blocks in a 1k sample and goes
    quadratic at 10^6 docs).  Compounds without an audited entry get
    min(parents) — an intersection's pair count is bounded by its
    cheapest part — so every candidate is costed at the same
    (corpus) scale when stats cover the simple candidates.

    ``audit_fn`` (specs → pred_id → pairs): called once with the
    compound candidates the greedy constructs, so intersections are
    costed EXACTLY too (min(parents) over-estimates a selective
    compound; measured 2.7x on the bench corpus).  Typically
    ``lambda s: key_stats_of(audit_predicates(corpus, s, fdefs))``."""
    candidates = candidate_simple_predicates(field_defs)

    # Evaluate each candidate: cover set over matches + blocked-pair cost
    cover: list[set[int]] = []
    cost: list[float] = []
    key_cache: dict[tuple[str, int], set[str]] = {}

    def keys(spec: PredicateSpec, rid: int) -> set[str]:
        ck = (spec.pred_id, rid)
        if ck not in key_cache:
            key_cache[ck] = _record_keys(spec, records[rid])
        return key_cache[ck]

    def costed(spec: PredicateSpec, sample_cost: float) -> float:
        if not key_stats:
            return sample_cost + 1.0
        if spec.pred_id in key_stats:
            return key_stats[spec.pred_id] + 1.0
        if spec.kind == "compound":
            parts = [key_stats[f"{n}:{f}"] for n, f in spec.parts
                     if f"{n}:{f}" in key_stats]
            if len(parts) == len(spec.parts):
                return min(parts) + 1.0
        return sample_cost + 1.0

    for spec in candidates:
        cov = set()
        for mi, (a, b) in enumerate(matches):
            if keys(spec, a) & keys(spec, b):
                cov.add(mi)
        # cost estimate: sum over keys of (count choose 2) on the sample
        key_counts: dict[str, int] = {}
        for rid in records:
            for k in keys(spec, rid):
                key_counts[k] = key_counts.get(k, 0) + 1
        c = sum(v * (v - 1) / 2 for v in key_counts.values())
        cover.append(cov)
        cost.append(costed(spec, c))

    # compounds of the 6 best simple predicates by cover/cost
    if use_compound:
        ranked = sorted(range(len(candidates)),
                        key=lambda i: len(cover[i]) / cost[i], reverse=True)[:6]
        compounds = [PredicateSpec(
            "compound", candidates[i].field,
            parts=((candidates[i].name, candidates[i].field),
                   (candidates[j].name, candidates[j].field)))
            for i, j in combinations(ranked, 2)]
        if audit_fn is not None and compounds:
            key_stats = {**(key_stats or {}), **audit_fn(compounds)}
        for spec in compounds:
            cov = set()
            for mi, (a, b) in enumerate(matches):
                if _record_keys(spec, records[a]) & _record_keys(spec, records[b]):
                    cov.add(mi)
            key_counts = {}
            for rid in records:
                for k in _record_keys(spec, records[rid]):
                    key_counts[k] = key_counts.get(k, 0) + 1
            c = sum(v * (v - 1) / 2 for v in key_counts.values())
            candidates.append(spec)
            cover.append(cov)
            cost.append(costed(spec, c))

    target = math.ceil(recall_target * len(matches))
    chosen: list[PredicateSpec] = []
    covered: set[int] = set()
    remaining = set(range(len(candidates)))
    while len(covered) < target and remaining and len(chosen) < max_predicates:
        best, best_score = None, -1.0
        for i in remaining:
            gain = len(cover[i] - covered)
            score = gain / cost[i]
            if score > best_score and gain > 0:
                best, best_score = i, score
        if best is None:
            break
        chosen.append(candidates[best])
        covered |= cover[best]
        remaining.discard(best)
    return chosen


def train_model(records: dict[int, dict], labeled_pairs: list[tuple[int, int, bool]],
                field_defs: list[FieldDef], alpha: float = 0.1,
                max_predicates: int = 4, corpus_idf: bool = True,
                key_stats: dict[str, float] | None = None) -> Model:
    """Driver-side training (E3 flow †): normalize sample records,
    compute IDF for Text fields, fit LR on labeled pairs, learn the
    blocking predicate union from the positive pairs.  ``key_stats``:
    corpus-scale predicate costs (see learn_predicates)."""
    recs = {rid: _normalize_record(r, field_defs) for rid, r in records.items()}
    idf: dict[str, dict[str, float]] = {}
    if corpus_idf:
        for f in field_defs:
            if f.type == "Text":
                idf[f.field] = compute_idf(
                    [recs[rid].get(f"{f.field}__tokens", []) for rid in recs])
    dm = DataModel(field_defs, idf)
    cols_a: dict[str, list] = {}
    cols_b: dict[str, list] = {}
    y = np.array([float(lbl) for _, _, lbl in labeled_pairs])
    names = {f.field for f in field_defs if f.type != "Interaction"}
    for fname in names:
        cols_a[fname] = [recs[a].get(fname) for a, _, _ in labeled_pairs]
        cols_b[fname] = [recs[b].get(fname) for _, b, _ in labeled_pairs]
        tk = f"{fname}__tokens"
        if any(tk in recs[a] for a, _, _ in labeled_pairs):
            cols_a[tk] = [recs[a].get(tk, []) for a, _, _ in labeled_pairs]
            cols_b[tk] = [recs[b].get(tk, []) for _, b, _ in labeled_pairs]
    x = dm.distances(cols_a, cols_b)
    weights, bias = fit_logistic_regression(x, y, alpha=alpha)
    matches = [(a, b) for a, b, lbl in labeled_pairs if lbl]
    predicates = learn_predicates(recs, matches, field_defs,
                                  max_predicates=max_predicates,
                                  key_stats=key_stats)
    return Model(field_defs=field_defs, predicates=predicates,
                 weights=weights, bias=bias, idf=idf)


class ActiveLearner:
    """A4 †: active-learning analog of dedupe's DisagreementLearner /
    ``uncertain_pairs`` (dedupe:dedupe/labeler.py, api.py::prepare_
    training) — uncertainty sampling over a blocked + random candidate
    pool, so few manual labels reach the accuracy of a fully-labeled
    training set.  Driver-side on sampled records, like the reference.

    Protocol::

        al = ActiveLearner(records, field_defs)
        while al.has_candidates() and budget:
            pair = al.uncertain_pair()      # most informative next pair
            al.mark(pair, user_says_match)  # label it
        model = al.model()                  # LR + learned blocking

    Pair selection: the classifier is bootstrapped from SYNTHETIC
    seeds the way the reference's RLRLearner is † — self-pairs
    (record, record) as guaranteed positives and random cross pairs as
    presumed negatives — so uncertainty sampling (probability closest
    to 0.5) works from the very first query; real labels progressively
    dominate the synthetic seeds."""

    def __init__(self, records: dict[int, dict], field_defs: list[FieldDef],
                 alpha: float = 0.1, pool_cap: int = 5000, seed: int = 42,
                 corpus_idf: bool = True):
        self.field_defs = list(field_defs)
        self.alpha = alpha
        self.records = {rid: _normalize_record(r, field_defs)
                        for rid, r in records.items()}
        idf: dict[str, dict[str, float]] = {}
        if corpus_idf:
            for f in field_defs:
                if f.type == "Text":
                    idf[f.field] = compute_idf(
                        [self.records[r].get(f"{f.field}__tokens", [])
                         for r in self.records])
        self.idf = idf
        self.dm = DataModel(field_defs, idf)
        rng = np.random.RandomState(seed)
        rids = sorted(self.records)
        # blocked candidates: pairs sharing a first-token key on any
        # non-interaction field (cheap, high-recall seed blocking †)
        pool: set[tuple[int, int]] = set()
        for f in field_defs:
            if f.type == "Interaction":
                continue
            spec = PredicateSpec("simple", f.field, "firstTokenPredicate")
            by_key: dict[str, list[int]] = {}
            for rid in rids:
                try:
                    ks = _record_keys(spec, self.records[rid])
                except Exception:
                    continue
                for k in ks:
                    by_key.setdefault(k, []).append(rid)
            for members in by_key.values():
                if len(members) < 2:
                    continue
                for i in range(len(members)):
                    for j in range(i + 1, min(i + 26, len(members))):
                        pool.add((members[i], members[j]))
                        if len(pool) >= pool_cap:
                            break
        # plus random pairs (negative-class coverage †)
        n_rand = min(pool_cap // 2, 10 * len(rids))
        for _ in range(n_rand):
            a, b = rng.choice(len(rids), 2, replace=False)
            pool.add((rids[min(a, b)], rids[max(a, b)]))
        self.pool = sorted(pool)
        self._x = self._features(self.pool)
        # synthetic bootstrap (reference RLRLearner seeding †):
        # (r, r) self-pairs are perfect matches; random pairs are
        # almost surely distinct — enough signal for a first fit.
        seed_rids = [rids[i] for i in
                     rng.choice(len(rids), min(8, len(rids)), replace=False)]
        self._seed_pairs = [(r, r) for r in seed_rids]
        self._seed_y = [True] * len(seed_rids)
        for _ in range(min(8, max(1, len(rids) - 1))):
            a, b = rng.choice(len(rids), 2, replace=False)
            self._seed_pairs.append((rids[min(a, b)], rids[max(a, b)]))
            self._seed_y.append(False)
        self.labeled: list[tuple[int, int, bool]] = []
        self._weights: np.ndarray | None = None
        self._bias = 0.0
        self._refit()

    def _features(self, pairs: list[tuple[int, int]]) -> np.ndarray:
        names = {f.field for f in self.field_defs if f.type != "Interaction"}
        ca: dict[str, list] = {}
        cb: dict[str, list] = {}
        for fname in names:
            ca[fname] = [self.records[a].get(fname) for a, _ in pairs]
            cb[fname] = [self.records[b].get(fname) for _, b in pairs]
            tk = f"{fname}__tokens"
            if any(tk in self.records[a] for a, _ in pairs):
                ca[tk] = [self.records[a].get(tk, []) for a, _ in pairs]
                cb[tk] = [self.records[b].get(tk, []) for _, b in pairs]
        return self.dm.distances(ca, cb) if pairs else \
            np.zeros((0, self.dm.n_features))

    def has_candidates(self) -> bool:
        return len(self.pool) > 0

    def _refit(self) -> None:
        # synthetic seeds keep both classes present until real labels
        # cover them; real labels then dominate (they are the tail of
        # the design matrix and outnumber the fixed seeds over time)
        pairs = self._seed_pairs + [(a, b) for a, b, _ in self.labeled]
        y = np.array([float(v) for v in self._seed_y] +
                     [float(lbl) for _, _, lbl in self.labeled])
        x = self._features(pairs)
        self._weights, self._bias = fit_logistic_regression(
            x, y, alpha=self.alpha)

    def uncertain_pair(self) -> tuple[int, int]:
        """The next pair to label (does not remove it — ``mark`` does)."""
        if not self.pool:
            raise IndexError("candidate pool exhausted")
        p = 1.0 / (1.0 + np.exp(-(self._x @ self._weights + self._bias)))
        return self.pool[int(np.argmin(np.abs(p - 0.5)))]

    def mark(self, pair: tuple[int, int], label: bool) -> None:
        self.labeled.append((pair[0], pair[1], bool(label)))
        try:
            idx = self.pool.index(pair)
            self.pool.pop(idx)
            self._x = np.delete(self._x, idx, axis=0)
        except ValueError:
            pass
        self._refit()

    def model(self, max_predicates: int = 4) -> Model:
        """Freeze: LR weights from the labels gathered so far + learned
        blocking over the labeled matches (same path as train_model)."""
        matches = [(a, b) for a, b, lbl in self.labeled if lbl]
        if not matches:
            raise ValueError("need at least one labeled match to learn "
                             "blocking predicates")
        predicates = learn_predicates(self.records, matches, self.field_defs,
                                      max_predicates=max_predicates)
        return Model(field_defs=self.field_defs, predicates=predicates,
                     weights=self._weights, bias=self._bias, idf=self.idf)


def sample_records(ds, n: int, seed: int = 42) -> dict[int, dict]:
    """O2 †: random record sample for training
    (dedupe:dedupe/api.py::prepare_training / core.randomPairs).
    Driver-side dict keyed by record_id, like the reference's
    data_d."""
    total = ds.count()
    frac = min(1.0, (n * 1.2) / max(total, 1))
    rows = ds.random_sample(frac, seed=seed).limit(n).take_all()
    return {r["record_id"]: {k: v for k, v in r.items()
                             if k != "record_id"} for r in rows}


def _normalize_record(rec: dict, field_defs: list[FieldDef]) -> dict:
    out = dict(rec)
    for f in field_defs:
        if f.type in ("String", "ShortString", "Text"):
            v = normalize_str(rec.get(f.field))
            out[f.field] = v
            out[f"{f.field}__tokens"] = tokens_of(v)
    return out
