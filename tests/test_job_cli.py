"""`python -m dedupe_api_ray.job` — the ray-job-submit entrypoint
(SURVEY.md §7 M7: train / partition / recordlink as submittable batch
jobs; north_star "driven by ray job submit")."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def job_env(ray_session, tiny_corpus, tmp_path_factory):
    """Records parquet + dedupe-style training JSON on disk."""
    from dedupe_api_ray.fixtures import record_id_of_url
    from dedupe_api_ray.sources.io import write_training

    root = tmp_path_factory.mktemp("job_cli")
    pages = tiny_corpus["pages"].to_pydict()
    rids = [record_id_of_url(u) for u in pages["url"]]
    tbl = pa.table({
        "record_id": pa.array(rids, pa.int64()),
        "text": pages["text"],
        "url_host": [u.split("/")[2] for u in pages["url"]],
    })
    records_pq = str(root / "records.parquet")
    pq.write_table(tbl, records_pq)

    recs = {r: {"text": t, "url_host": h}
            for r, t, h in zip(rids, tbl["text"].to_pylist(),
                               tbl["url_host"].to_pylist())}
    lp = tiny_corpus["labeled_pairs"].to_pydict()
    labeled = [(a, b, bool(l)) for a, b, l in
               zip(lp["id_a"], lp["id_b"], lp["label"])]
    training_json = str(root / "training.json")
    write_training(training_json, recs, labeled)
    return {"root": root, "records_pq": records_pq,
            "training_json": training_json, "n_rows": len(rids)}


def _run(argv, capsys):
    from dedupe_api_ray.job import main

    assert main(argv) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_job_train_then_partition(job_env, capsys):
    import ray

    settings = str(job_env["root"] / "settings.pkl")
    out = _run(["train",
                "--training", job_env["training_json"],
                "--fields", "text:Text,url_host:ShortString",
                "--output", settings], capsys)
    assert out["job"] == "train" and os.path.exists(settings)
    assert out["records"] > 0 and out["labeled_pairs"] > 0

    emap_dir = str(job_env["root"] / "entity_map")
    ckpt_dir = str(job_env["root"] / "ckpt")
    out = _run(["partition",
                "--input", job_env["records_pq"],
                "--model", settings,
                "--output", emap_dir,
                "--ckpt-dir", ckpt_dir], capsys)
    assert out["job"] == "partition"
    assert out["rows"] == job_env["n_rows"]
    # resumable sink + per-stage manifests
    emap = ray.data.read_parquet(emap_dir)
    assert sorted(emap.schema().names) == ["cluster_id", "confidence",
                                           "record_id"]
    assert emap.count() == job_env["n_rows"]
    assert os.path.exists(os.path.join(ckpt_dir, "scores",
                                       "_MANIFEST.json"))
    # the reused pre-initialised Ray session must survive the job
    assert ray.is_initialized()


def test_job_train_with_corpus_audit(job_env, capsys):
    """--audit-input costs candidates at corpus scale (stages/audit):
    training still succeeds and reports the audited top pair costs."""
    settings = str(job_env["root"] / "settings_audited.pkl")
    out = _run(["train",
                "--training", job_env["training_json"],
                "--fields", "text:Text,url_host:ShortString",
                "--audit-input", job_env["records_pq"],
                "--output", settings], capsys)
    assert out["job"] == "train" and os.path.exists(settings)
    assert out["audit_top_pair_costs"]  # non-empty pred_id -> pairs
    assert out["predicates"]


def test_job_partition_reuses_checkpoints(job_env, capsys):
    """Second run with the same ckpt dir resumes and matches."""
    import ray

    settings = str(job_env["root"] / "settings.pkl")
    emap2 = str(job_env["root"] / "entity_map_2")
    out = _run(["partition",
                "--input", job_env["records_pq"],
                "--model", settings,
                "--output", emap2,
                "--ckpt-dir", str(job_env["root"] / "ckpt")], capsys)
    assert out["rows"] == job_env["n_rows"]
    a = ray.data.read_parquet(str(job_env["root"] / "entity_map")) \
        .to_pandas().sort_values("record_id").reset_index(drop=True)
    b = ray.data.read_parquet(emap2) \
        .to_pandas().sort_values("record_id").reset_index(drop=True)
    assert a.equals(b)


def test_job_recordlink(job_env, capsys):
    import ray

    from dedupe_api_ray.fixtures import make_tabular_fixture

    fix = make_tabular_fixture(n_entities=30, seed=7)
    tbl = fix["records"]
    cols = tbl.to_pydict()
    n = len(cols["record_id"])
    left = tbl.slice(0, n // 2)
    right = tbl.slice(n // 2)
    root = job_env["root"]
    lp, rp = str(root / "left.parquet"), str(root / "right.parquet")
    pq.write_table(left, lp)
    pq.write_table(right, rp)

    from dedupe_api_ray.model import FieldDef, train_model
    recs = {cols["record_id"][i]:
            {k: cols[k][i] for k in ("name", "address")}
            for i in range(n)}
    gold = fix["labeled_pairs"].to_pydict()
    labeled = [(a, b, bool(l)) for a, b, l in
               zip(gold["id_a"], gold["id_b"], gold["label"])]
    model = train_model(recs, labeled,
                        [FieldDef("name", "String"),
                         FieldDef("address", "String")],
                        max_predicates=2)
    settings = str(root / "rl_settings.pkl")
    model.save(settings)

    out_dir = str(root / "links")
    out = _run(["recordlink",
                "--left", lp, "--right", rp,
                "--model", settings,
                "--output", out_dir,
                "--threshold", "0.5"], capsys)
    assert out["job"] == "recordlink"
    if out["rows"]:
        links = ray.data.read_parquet(out_dir).to_pandas()
        assert {"id_a", "id_b", "score"} <= set(links.columns)
        # one-to-one: no id reused on either side
        assert links["id_a"].is_unique and links["id_b"].is_unique


def test_job_incremental(job_env, capsys):
    """incremental: new rows x canon reps -> full increment map (the
    matched rows keep existing cluster ids, the rest partitions)."""
    import ray

    root = job_env["root"]
    canon_pq = str(root / "inc_canon.parquet")
    new_pq = str(root / "inc_new.parquet")
    pq.write_table(pa.table({
        "cluster_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon",
                          "zeta eta theta iota kappa"]),
        "url_host": pa.array(["h0.example.com", "h1.example.com"]),
    }), canon_pq)
    pq.write_table(pa.table({
        "record_id": pa.array([100, 101, 102], pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon",
                          "nu xi omicron pi rho",
                          "nu xi omicron pi rho"]),
        "url_host": pa.array(["h0.example.com", "h9.example.com",
                              "h9.example.com"]),
    }), new_pq)

    settings = str(root / "settings.pkl")  # trained by the first test
    out_dir = str(root / "inc_map")
    out = _run(["incremental",
                "--input", new_pq, "--canon", canon_pq,
                "--model", settings,
                "--output", out_dir,
                "--threshold", "0.5"], capsys)
    assert out["job"] == "incremental"
    assert out["rows"] == 3
    em = ray.data.read_parquet(out_dir).to_pandas()
    got = dict(zip(em["record_id"], em["cluster_id"]))
    # every increment row mapped exactly once; exact-text match folds
    # into the existing cluster, the novel dup pair forms a fresh one
    assert set(got) == {100, 101, 102}
    assert got[100] == 1
    assert got[101] == got[102] == 101
