"""Train a model on the tabular fixture and check the pure-Python
mini-oracle recovers the gold clusters (SURVEY.md §5.3 — this freezes
reference clustering semantics before the distributed engine is
compared against them)."""

import numpy as np
import pytest

from dedupe_api_ray.fixtures import pairwise_f1
from dedupe_api_ray.model import FieldDef, train_model
from dedupe_api_ray.oracle import oracle_partition

TABULAR_FIELDS = [
    FieldDef("name", "String"),
    FieldDef("address", "String"),
    FieldDef("zip", "Exact"),
    FieldDef("phone", "String", has_missing=True),
]


def _records_dict(tbl):
    cols = tbl.to_pydict()
    return {rid: {k: cols[k][i] for k in ("name", "address", "zip", "phone")}
            for i, rid in enumerate(cols["record_id"])}


def test_train_and_oracle_partition(tabular_fixture):
    records = _records_dict(tabular_fixture["records"])
    lp = tabular_fixture["labeled_pairs"].to_pydict()
    labeled = list(zip(lp["id_a"], lp["id_b"], lp["label"]))
    model = train_model(records, labeled, TABULAR_FIELDS)

    # classifier separates the labeled pairs well
    assert model.weights.shape[0] == len(model.data_model().feature_names)
    assert len(model.predicates) >= 1

    assign = oracle_partition(records, model, threshold=0.5)
    gold_cols = tabular_fixture["gold_clusters"].to_pydict()
    gold = dict(zip(gold_cols["record_id"], gold_cols["cluster_id"]))
    f1 = pairwise_f1({r: c for r, (c, _) in assign.items()}, gold)
    assert f1 >= 0.9, f"oracle pairwise F1 too low: {f1}"


def test_model_roundtrip(tmp_path, tabular_fixture):
    records = _records_dict(tabular_fixture["records"])
    lp = tabular_fixture["labeled_pairs"].to_pydict()
    labeled = list(zip(lp["id_a"], lp["id_b"], lp["label"]))
    model = train_model(records, labeled, TABULAR_FIELDS, max_predicates=2)
    p = str(tmp_path / "settings.pkl")
    model.save(p)
    from dedupe_api_ray.model import Model

    m2 = Model.load(p)
    assert np.allclose(m2.weights, model.weights)
    assert [s.pred_id for s in m2.predicates] == [s.pred_id for s in model.predicates]


def test_active_learner_label_efficiency(tabular_fixture):
    """A4: uncertainty sampling reaches the fully-labeled model's
    clustering quality with a third of the labels."""
    from dedupe_api_ray.model import ActiveLearner

    records = _records_dict(tabular_fixture["records"])
    gold_cols = tabular_fixture["gold_clusters"].to_pydict()
    gold = dict(zip(gold_cols["record_id"], gold_cols["cluster_id"]))
    lp = tabular_fixture["labeled_pairs"].to_pydict()
    n_full = len(lp["id_a"])
    budget = max(10, n_full // 3)

    al = ActiveLearner(records, TABULAR_FIELDS, seed=42)
    assert al.has_candidates()
    for _ in range(budget):
        if not al.has_candidates():
            break
        pair = al.uncertain_pair()
        al.mark(pair, gold[pair[0]] == gold[pair[1]])
    model = al.model()
    assert len(al.labeled) < n_full, "must use fewer labels than full set"

    assign = oracle_partition(records, model, threshold=0.5)
    f1 = pairwise_f1({r: c for r, (c, _) in assign.items()}, gold)
    assert f1 >= 0.9, f"active-learned model F1 too low: {f1}"


def test_lr_learns_separable():
    from dedupe_api_ray.model import fit_logistic_regression

    rng = np.random.default_rng(0)
    x = rng.normal(size=(400, 3))
    y = (x[:, 0] + 2 * x[:, 1] > 0).astype(float)
    w, b = fit_logistic_regression(x, y, alpha=0.01)
    p = 1 / (1 + np.exp(-(x @ w + b)))
    acc = ((p > 0.5) == y).mean()
    assert acc > 0.95
