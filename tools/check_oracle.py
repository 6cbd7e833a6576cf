"""Local mirror of the driver's correctness gate: run every queries()
entry and its oracle_sql() side by side, compare row-count, column
names and an order-insensitive value hash.  Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def value_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(df.astype(str).apply("|".join, axis=1).tolist())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> None:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: engine raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.monotonic() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS {name}: {len(got)} rows in {dt:.1f}s (no oracle)")
            n_rowsonly += 1
            continue
        t1 = time.monotonic()
        try:
            want = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL raised {e}")
            n_fail += 1
            continue
        dt_sql = time.monotonic() - t1
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} != {sorted(want.columns)}")
        if not problems and value_hash(got) != value_hash(want):
            problems.append("value hash mismatch")
            # show a diff sample
            g = got.reindex(sorted(got.columns), axis=1)
            w = want.reindex(sorted(want.columns), axis=1)
            gs = set(g.astype(str).apply("|".join, axis=1))
            ws = set(w.astype(str).apply("|".join, axis=1))
            extra = list(gs - ws)[:3]
            missing = list(ws - gs)[:3]
            if extra:
                problems.append(f"engine-only rows: {extra}")
            if missing:
                problems.append(f"oracle-only rows: {missing}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows in {dt:.1f}s "
                  f"(oracle {dt_sql:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
