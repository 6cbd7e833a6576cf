"""PII scrub (extras.pii) and cross-document duplicate n-gram
statistics (extras.ngram_dup)."""

import numpy as np
import pyarrow as pa

import ray
import ray.data


def test_pii_counts_and_redaction():
    from dedupe_api_ray.extras.pii import pii_counts_batch, redact_pii_batch

    t = pa.table({"text": pa.array([
        "mail jo.doe+x@ex-a.co.uk or call (555) 123 4567",
        "ip 10.0.255.3 ssn 123-45-6789 tel 555-123-4567",
        "clean text with no pii at all",
        None])})
    c = pii_counts_batch(t)
    assert c["n_email"].to_pylist() == [1, 0, 0, 0]
    assert c["n_phone"].to_pylist() == [1, 1, 0, 0]
    assert c["n_ipv4"].to_pylist() == [0, 1, 0, 0]
    assert c["n_ssn"].to_pylist() == [0, 1, 0, 0]
    assert c["n_pii"].to_pylist() == [2, 3, 0, 0]
    r = redact_pii_batch(t)["text_redacted"].to_pylist()
    assert r[0] == "mail <EMAIL> or call <PHONE>"
    assert r[1] == "ip <IP> ssn <SSN> tel <PHONE>"
    assert r[2] == "clean text with no pii at all"
    assert r[3] is None
    # no digit of any planted PII survives redaction
    assert not any(ch.isdigit() for ch in r[0] + r[1])


def test_pii_ssn_not_eaten_by_phone():
    """Application order: SSN (3-2-4) must never be half-consumed by
    the phone pattern (3-3-4)."""
    from dedupe_api_ray.extras.pii import redact_pii_batch

    t = pa.table({"text": pa.array(["ssn 123-45-6789 phone 123-456-7890"])})
    out = redact_pii_batch(t)["text_redacted"].to_pylist()[0]
    assert out == "ssn <SSN> phone <PHONE>"


def test_scrub_pii_dataset(ray_session):
    from dedupe_api_ray.extras.pii import scrub_pii

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["write a@b.io", "nothing here"])}))
    df = scrub_pii(ds).to_pandas().sort_values("doc_id")
    assert list(df["n_pii"]) == [1, 0]
    assert list(df["text_redacted"]) == ["write <EMAIL>", "nothing here"]


def test_dup_ngram_stats_basic(ray_session):
    from dedupe_api_ray.extras.ngram_dup import dup_ngram_stats

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b c d e f g h i j",     # shares 'a..h' with doc 2
            "a b c d e f g h x y",
            "z1 z2 z3 z4 z5 z6 z7 z8",  # unique 8-gram
            "short text"])}))           # < 8 tokens: no output row
    df = dup_ngram_stats(docs, w=8, min_docs=2).to_pandas() \
        .set_index("doc_id").sort_index()
    assert list(df.index) == [1, 2, 3]
    assert df.loc[1, "n_shingles"] == 3 and df.loc[1, "n_dup"] == 1
    assert df.loc[2, "n_shingles"] == 3 and df.loc[2, "n_dup"] == 1
    assert df.loc[3, "n_shingles"] == 1 and df.loc[3, "n_dup"] == 0
    assert abs(df.loc[1, "dup_fraction"] - 0.333333) < 1e-9


def test_repetition_stats_values():
    from dedupe_api_ray.extras.textstats import repetition_stats_batch

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array(["batch batch batch", "a b c d a b",
                                    "x", ""])})
    df = repetition_stats_batch(t).to_pandas().set_index("doc_id")
    assert list(df.index) == [1, 2, 3]  # empty doc emits no row
    assert df.loc[1, "top_token_ratio"] == 1.0
    assert df.loc[1, "dup_bigram_fraction"] == 1.0  # 'batch batch' x2 of 2
    assert abs(df.loc[2, "top_token_ratio"] - 0.333333) < 1e-9
    assert df.loc[2, "dup_bigram_fraction"] == 0.4  # 'a b' x2 of 5
    assert df.loc[3, "n_tokens"] == 1
    assert df.loc[3, "dup_bigram_fraction"] == 0.0


def test_dup_ngram_join_path_matches_broadcast(ray_session, monkeypatch):
    """The size-routed flag attach: hash-join scale path must produce
    the identical result to the broadcast path."""
    import dedupe_api_ray.utils as U
    from dedupe_api_ray.extras.ngram_dup import dup_ngram_stats

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=20)) for _ in range(40)]
    texts += texts[:10]  # exact dups guarantee shared shingles
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    a = dup_ngram_stats(docs).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    monkeypatch.setattr(U, "should_broadcast", lambda ds, **kw: False)
    b = dup_ngram_stats(docs).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert a.equals(b)
    dup_docs = set(a.loc[a["n_dup"] > 0, "doc_id"])
    assert set(range(10)) | set(range(40, 50)) <= dup_docs


def test_remove_dup_ngrams_basic(ray_session):
    from dedupe_api_ray.extras.ngram_dup import remove_dup_ngrams

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b c d e f g h i j",      # 'a..h' dup with doc 2
            "x y a b c d e f g h",
            "u1 u2 u3 u4 u5 u6 u7 u8",  # unique 8-gram: untouched
            "short text"])}))            # < 8 tokens: untouched
    df = remove_dup_ngrams(docs, w=8, min_docs=2).to_pandas() \
        .set_index("doc_id").sort_index()
    # the shared window covers tokens 0..7 of doc 1 and 2..9 of doc 2
    assert df.loc[1, "text_dedup"] == "i j"
    assert df.loc[1, "n_removed"] == 8 and df.loc[1, "n_tokens"] == 10
    assert df.loc[2, "text_dedup"] == "x y"
    assert df.loc[3, "n_removed"] == 0
    assert df.loc[3, "text_dedup"] == "u1 u2 u3 u4 u5 u6 u7 u8"
    assert df.loc[4, "text_dedup"] == "short text"


def test_remove_dup_ngrams_overlapping_spans(ray_session):
    from dedupe_api_ray.extras.ngram_dup import remove_dup_ngrams

    # doc 1 repeats the shared phrase twice with one token between:
    # coverage is a UNION of overlapping [pos, pos+8) spans
    shared = "p1 p2 p3 p4 p5 p6 p7 p8"
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([f"{shared} mid {shared} tail", shared])}))
    df = remove_dup_ngrams(docs, w=8, min_docs=2).to_pandas() \
        .set_index("doc_id").sort_index()
    assert df.loc[1, "text_dedup"] == "mid tail"
    assert df.loc[1, "n_removed"] == 16
    assert df.loc[2, "text_dedup"] == "" and df.loc[2, "n_removed"] == 8


def test_remove_dup_ngrams_join_path_matches_broadcast(ray_session,
                                                       monkeypatch):
    import dedupe_api_ray.utils as U
    from dedupe_api_ray.extras.ngram_dup import remove_dup_ngrams

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(25)]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(30)]
    texts += texts[:8]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    a = remove_dup_ngrams(docs).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    monkeypatch.setattr(U, "should_broadcast", lambda ds, **kw: False)
    b = remove_dup_ngrams(docs).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert a.equals(b)
    # exact-dup docs lose everything; output must still carry a row
    assert len(a) == len(texts)
    assert (a.loc[a["doc_id"] < 8, "n_removed"] ==
            a.loc[a["doc_id"] < 8, "n_tokens"]).all()
