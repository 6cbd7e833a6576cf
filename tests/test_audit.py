"""Corpus-scale predicate audit (stages/audit.py) and its feedback
into the blocking learner (model.py::learn_predicates key_stats) —
the control against fixed-cardinality predicates going quadratic at
scale (BENCH/BASELINE.md, 950k-page pair-volume cliff)."""

import numpy as np
import pyarrow as pa
import pytest

from dedupe_api_ray.model import (FieldDef, PredicateSpec,
                                  candidate_simple_predicates,
                                  learn_predicates)


def test_audit_counts_exact(ray_session):
    import ray.data

    from dedupe_api_ray.stages.audit import audit_predicates, key_stats_of

    # 6 records; normalized text lowers + collapses whitespace
    texts = ["Alpha beta", "alpha   beta", "alpha gamma",
             "beta one", "BETA two", None]
    tbl = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    specs = [PredicateSpec("simple", "text", "firstTokenPredicate"),
             PredicateSpec("simple", "text", "wholeFieldPredicate")]
    audit = audit_predicates(ray.data.from_arrow(tbl), specs,
                             [FieldDef("text", "ShortString")],
                             id_col="doc_id").to_pandas()
    ft = audit[audit.predicate == "firstTokenPredicate:text"].iloc[0]
    # first tokens: alpha x3, beta x2 (null row emits nothing)
    assert ft.n_keys == 2 and ft.n_rows == 5 and ft.max_key_rows == 3
    assert ft.est_pairs == 3 + 1  # C(3,2) + C(2,2)
    wf = audit[audit.predicate == "wholeFieldPredicate:text"].iloc[0]
    # whole fields: 'alpha beta' x2 (whitespace collapsed), 3 singles
    assert wf.n_keys == 4 and wf.n_rows == 5 and wf.max_key_rows == 2
    assert wf.est_pairs == 1
    ks = key_stats_of(audit.pipe(pa.Table.from_pandas))
    assert ks["firstTokenPredicate:text"] == 4.0


def test_audit_zero_key_predicate_row(ray_session):
    """A predicate that emits no keys still gets an (all-zero) row."""
    import ray.data

    from dedupe_api_ray.stages.audit import audit_predicates

    tbl = pa.table({"record_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["--", "!!"], pa.string())})
    specs = [PredicateSpec("simple", "text", "firstTokenPredicate"),
             PredicateSpec("simple", "text", "wholeFieldPredicate")]
    audit = audit_predicates(ray.data.from_arrow(tbl), specs,
                             [FieldDef("text", "ShortString")]).to_pandas()
    assert len(audit) == 2
    ft = audit[audit.predicate == "firstTokenPredicate:text"].iloc[0]
    assert ft.n_keys == 0 and ft.n_rows == 0 and ft.est_pairs == 0.0


def _sample_records():
    """Sample where wholeFieldPredicate looks CHEAPEST (tiny exact-dup
    blocks) while firstTokenPredicate looks expensive (every record
    shares the first token)."""
    recs = {1: {"name": "alpha beta"}, 2: {"name": "alpha beta"},
            3: {"name": "alpha gamma"}, 4: {"name": "alpha gamma"}}
    for i in range(5, 13):
        recs[i] = {"name": f"alpha unique{i}"}
    matches = [(1, 2), (3, 4)]
    return recs, matches


def test_key_stats_override_flips_selection():
    recs, matches = _sample_records()
    fdefs = [FieldDef("name", "ShortString")]

    base = learn_predicates(recs, matches, fdefs, max_predicates=1,
                            use_compound=False)
    assert base[0].name == "wholeFieldPredicate"  # sample cost: 2 pairs

    # corpus audit says wholeField collapses at scale (e.g. boilerplate
    # pages) while firstToken stays cheap; every candidate gets a
    # corpus-scale cost so ratios compare like-for-like
    stats = {s.pred_id: 1e9 for s in candidate_simple_predicates(fdefs)}
    stats["firstTokenPredicate:name"] = 100.0
    scaled = learn_predicates(recs, matches, fdefs, max_predicates=1,
                              use_compound=False, key_stats=stats)
    assert scaled[0].name == "firstTokenPredicate"


def test_key_stats_compound_min_of_parents():
    """A compound without its own audit entry is costed min(parents),
    so compounds stay eligible (they are the stopword-averse choice)."""
    recs, matches = _sample_records()
    fdefs = [FieldDef("name", "ShortString")]
    stats = {s.pred_id: 1e9 for s in candidate_simple_predicates(fdefs)}
    # two parents cheap at corpus scale -> their compound (cost
    # min(parents)=50, same cover) wins on equal-cost tie-break order
    stats["firstTokenPredicate:name"] = 50.0
    stats["sameThreeCharStartPredicate:name"] = 50.0
    chosen = learn_predicates(recs, matches, fdefs, max_predicates=2,
                              use_compound=True, key_stats=stats)
    assert any(c.kind == "compound" or c.name in
               ("firstTokenPredicate", "sameThreeCharStartPredicate")
               for c in chosen)
    # nothing with a 1e9 corpus cost may be selected
    for c in chosen:
        if c.kind == "simple":
            assert stats[c.pred_id] < 1e9


def test_audit_fn_exact_compound_costs():
    """audit_fn gives the greedy's compounds EXACT corpus costs; a
    selective compound then beats its own parents (min-of-parents
    alone would tie and lose on ordering)."""
    recs, matches = _sample_records()
    fdefs = [FieldDef("name", "ShortString")]
    stats = {s.pred_id: 1e9 for s in candidate_simple_predicates(fdefs)}
    stats["firstTokenPredicate:name"] = 100.0
    stats["sameThreeCharStartPredicate:name"] = 100.0

    audited = {}

    def audit_fn(specs):
        audited.update({s.pred_id: 10.0 for s in specs})
        return dict(audited)

    chosen = learn_predicates(recs, matches, fdefs, max_predicates=1,
                              use_compound=True, key_stats=stats,
                              audit_fn=audit_fn)
    assert audited, "compound candidates were audited"
    assert chosen[0].kind == "compound"


def test_audit_matches_pipeline_keys(ray_session):
    """Audited est_pairs equals the exact pair count the partition
    pipeline's candidate_pairs would emit for a single-predicate
    model (before cross-predicate distinct)."""
    import ray.data

    from dedupe_api_ray.fixtures import make_pages_corpus, record_id_of_url
    from dedupe_api_ray.stages.audit import audit_predicates

    pages = make_pages_corpus(n_entities=60, seed=11)["pages"]
    rid = pa.array([record_id_of_url(u) for u in
                    pages["url"].to_pylist()], pa.int64())
    docs = pa.table({"record_id": rid, "text": pages["text"]})
    specs = [PredicateSpec("simple", "text", "firstTokenPredicate")]
    audit = audit_predicates(ray.data.from_arrow(docs), specs,
                             [FieldDef("text", "Text")]).to_pandas()

    # driver-side expectation: same normalization, firstToken's exact
    # match-at-start regex
    from dedupe_api_ray.functions.text import normalize_str
    from collections import Counter
    import re
    ftre = re.compile(r"[\w']+", re.ASCII)
    cnt = Counter()
    n_rows = 0
    for t in pages["text"].to_pylist():
        tn = normalize_str(t)
        m = ftre.match(tn) if tn else None
        if m:
            cnt[m.group(0)] += 1
            n_rows += 1
    row = audit.iloc[0]
    assert row.n_keys == len(cnt)
    assert row.n_rows == n_rows
    assert row.est_pairs == sum(v * (v - 1) / 2 for v in cnt.values())
