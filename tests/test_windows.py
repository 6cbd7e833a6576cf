"""Window functions (stages/windows.py): pandas parity, int
exactness, lag null placement, layout/parallelism invariance, loud
null/clash guards."""

import numpy as np
import pandas as pd
import pytest

from dedupe_api_ray.stages.windows import window_over


def _frame(n=500, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "ts": rng.integers(0, 10_000, n).astype("datetime64[s]")
        .astype("datetime64[us]"),
        "uid": np.arange(n),
        "x": rng.integers(-1000, 1000, n)})


def _expected(df):
    g = df.sort_values(["k", "ts", "uid"]).groupby("k", sort=False)
    out = df.sort_values(["k", "ts", "uid"]).copy()
    out["rn"] = g.cumcount() + 1
    out["run_x"] = g["x"].cumsum()
    out["prev_uid"] = g["uid"].shift(1)
    return out.sort_values("uid").reset_index(drop=True)


def test_window_matches_pandas_and_is_layout_invariant(ray_session):
    import ray.data

    df = _frame()
    want = _expected(df)
    prev = None
    for blocks, parts in ((1, 4), (7, 11)):
        ds = ray.data.from_pandas(
            [d for _, d in df.groupby(df.index % blocks)]
            if blocks > 1 else df)
        got = window_over(ds, partition_by="k",
                          order_by=["ts", "uid"], row_number="rn",
                          lag={"prev_uid": "uid"},
                          cumsum={"run_x": "x"},
                          num_partitions=parts).to_pandas() \
            .sort_values("uid").reset_index(drop=True)
        for c in ("rn", "run_x"):
            np.testing.assert_array_equal(got[c].to_numpy(),
                                          want[c].to_numpy())
        # lag: null exactly at each key's first row
        pg = got["prev_uid"].to_numpy(dtype=float)
        pw = want["prev_uid"].to_numpy(dtype=float)
        np.testing.assert_array_equal(np.isnan(pg), np.isnan(pw))
        np.testing.assert_array_equal(pg[~np.isnan(pg)],
                                      pw[~np.isnan(pw)])
        key = got[["rn", "run_x"]].to_numpy().tolist()
        if prev is not None:
            assert key == prev
        prev = key


def test_window_int64_cumsum_exact(ray_session):
    import ray.data

    # values near 2^53 would lose exactness in a float cumsum
    base = np.int64(1) << np.int64(53)
    df = pd.DataFrame({"k": [1, 1, 1], "o": [1, 2, 3],
                       "x": [base, 1, 1]})
    got = window_over(ray.data.from_pandas(df), partition_by="k",
                      order_by=["o"], cumsum={"run": "x"}).to_pandas()
    assert sorted(got["run"]) == [base, base + 1, base + 2]
    assert got["run"].dtype == np.int64


def test_window_guards(ray_session):
    import ray.data

    df = pd.DataFrame({"k": [1, None], "o": [1, 2], "x": [1, 2]})
    ds = ray.data.from_pandas(df)
    with pytest.raises(Exception, match="non-null"):
        window_over(ds, partition_by="k", order_by=["o"],
                    row_number="rn").to_pandas()
    ok = pd.DataFrame({"k": [1, 2], "o": [1, 2], "x": [1, 2]})
    with pytest.raises(ValueError, match="already exist"):
        window_over(ray.data.from_pandas(ok), partition_by="k",
                    order_by=["o"], row_number="x")
    with pytest.raises(ValueError, match="nothing to compute"):
        window_over(ray.data.from_pandas(ok), partition_by="k",
                    order_by=["o"])


def test_window_rank_dense_rank(ray_session):
    import ray.data

    rng = np.random.default_rng(17)
    df = pd.DataFrame({"k": rng.integers(0, 10, 400),
                       "v": rng.integers(0, 6, 400),   # heavy ties
                       "uid": np.arange(400)})
    got = window_over(ray.data.from_pandas(df), partition_by="k",
                      order_by=["v"], rank="rnk",
                      dense_rank="drnk").to_pandas()
    want_r = df.groupby("k")["v"].rank(method="min").astype(int)
    want_d = df.groupby("k")["v"].rank(method="dense").astype(int)
    got = got.sort_values("uid").reset_index(drop=True)
    np.testing.assert_array_equal(got["rnk"].to_numpy(),
                                  want_r.to_numpy())
    np.testing.assert_array_equal(got["drnk"].to_numpy(),
                                  want_d.to_numpy())


def test_window_ntile_percent_rank_duckdb_parity(ray_session):
    import duckdb
    import ray.data

    rng = np.random.default_rng(23)
    df = pd.DataFrame({"k": rng.integers(0, 7, 500),
                       "v": rng.integers(0, 9, 500),  # ties for pr
                       "uid": np.arange(500)})
    # ntile is position-based → unique final order column; pr is
    # tie-aware → order by the tied column alone, exercising ties
    got_nt = window_over(ray.data.from_pandas(df), partition_by="k",
                         order_by=["v", "uid"],
                         ntile={"nt": 4}).to_pandas() \
        .sort_values("uid").reset_index(drop=True)
    got_pr = window_over(ray.data.from_pandas(df), partition_by="k",
                         order_by=["v"],
                         percent_rank="pr").to_pandas() \
        .sort_values("uid").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    want = con.sql(
        "SELECT uid, ntile(4) OVER w AS nt, percent_rank() OVER "
        "(PARTITION BY k ORDER BY v) AS pr FROM t "
        "WINDOW w AS (PARTITION BY k ORDER BY v, uid) "
        "ORDER BY uid").df()
    np.testing.assert_array_equal(got_nt["nt"].to_numpy(),
                                  want["nt"].to_numpy())
    np.testing.assert_allclose(got_pr["pr"].to_numpy(),
                               want["pr"].to_numpy(), rtol=0, atol=0)


def test_window_ntile_small_partitions(ray_session):
    import ray.data

    # n < N: every row its own bucket, pos+1; single row: pr = 0.0
    df = pd.DataFrame({"k": [1, 1, 2], "o": [5, 3, 9],
                       "uid": [0, 1, 2]})
    got = window_over(ray.data.from_pandas(df), partition_by="k",
                      order_by=["o"], ntile={"nt": 10},
                      percent_rank="pr").to_pandas() \
        .sort_values("uid").reset_index(drop=True)
    assert list(got["nt"]) == [2, 1, 1]
    assert list(got["pr"]) == [1.0, 0.0, 0.0]


def test_window_lead(ray_session):
    import ray.data

    df = pd.DataFrame({"k": [1, 1, 1, 2], "o": [3, 1, 2, 9],
                       "uid": [10, 11, 12, 13]})
    got = window_over(ray.data.from_pandas(df), partition_by="k",
                      order_by=["o"], lead={"next_uid": "uid"},
                      lag={"prev_uid": "uid"}).to_pandas() \
        .sort_values(["k", "o"]).reset_index(drop=True)
    # k=1 ordered by o: uid 11, 12, 10
    assert list(got["next_uid"].fillna(-1)) == [12, 10, -1, -1]
    assert list(got["prev_uid"].fillna(-1)) == [-1, 11, 12, -1]


def test_window_unknown_partition_key_raises_early(ray_session):
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"k": [1], "o": [1]}))
    with pytest.raises(ValueError, match="no such column"):
        window_over(ds, partition_by="kk", order_by=["o"],
                    row_number="rn")


def test_window_composite_partition_key(ray_session):
    import ray.data

    rng = np.random.default_rng(29)
    df = pd.DataFrame({"a": rng.integers(0, 5, 600),
                       "b": rng.choice(list("xyz"), 600),
                       "o": rng.integers(0, 1000, 600),
                       "uid": np.arange(600)})
    got = window_over(ray.data.from_pandas(df),
                      partition_by=["a", "b"], order_by=["o", "uid"],
                      row_number="rn", cumsum={"run_o": "o"}) \
        .to_pandas().sort_values("uid").reset_index(drop=True)
    srt = df.sort_values(["a", "b", "o", "uid"])
    grp = srt.groupby(["a", "b"], sort=False)
    want = srt.copy()
    want["rn"] = grp.cumcount() + 1
    want["run_o"] = grp["o"].cumsum()
    want = want.sort_values("uid").reset_index(drop=True)
    np.testing.assert_array_equal(got["rn"], want["rn"])
    np.testing.assert_array_equal(got["run_o"], want["run_o"])
