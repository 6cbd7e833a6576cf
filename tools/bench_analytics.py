"""Scaling bench for the round-4 analytics family (window functions,
exact quantiles, grouped distinct count, grouped quantiles) — stages
that never appear in bench.py's flagship path.

Synthesizes a deterministic wide-events corpus ONCE to /tmp parquet
(seeded numpy; no external data), then runs each operator at two CPU
counts in FRESH child processes (the repo's calibrated protocol pair,
see BENCH/BASELINE.md: 2→8 on this hypervisor) and reports per-op
wall plus strong-scaling efficiency (t_lo / t_hi) / (hi / lo).
Determinism across parallelism is asserted on exact result values
(quantiles) and row counts (the rest).

Usage: python tools/bench_analytics.py [n_rows] [cpus_lo] [cpus_hi]
Writes BENCH/scaling_r4_analytics.json when run from the repo root.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
CPUS_LO = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CPUS_HI = int(sys.argv[3]) if len(sys.argv) > 3 else 8
DATA_DIR = f"/tmp/bench_analytics_{N_ROWS}"

_CHILD = r"""
import json, os, sys, time
import numpy as np
import ray, ray.data

n_cpus = int(sys.argv[1])
data_dir = sys.argv[2]
ray.init(address="local", num_cpus=n_cpus, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, os.getcwd())
from dedupe_api_ray.stages.windows import window_over
from dedupe_api_ray.stages.quantiles import (exact_quantiles,
                                             grouped_quantiles)
from dedupe_api_ray.stages.distinct import grouped_distinct_count

ds = ray.data.read_parquet(f"{data_dir}/rows")
out = {}

t0 = time.monotonic()
n = window_over(ds, partition_by="user_id", order_by=["ts", "rid"],
                row_number="rn", rank="rnk",
                lag={"prev_rid": "rid"},
                cumsum={"run_cents": "cents"}).count()
out["window"] = {"sec": round(time.monotonic() - t0, 2), "rows": n}

t0 = time.monotonic()
qt = exact_quantiles(ds, "value", [0.01, 0.25, 0.5, 0.75, 0.99])
out["quantiles"] = {"sec": round(time.monotonic() - t0, 2),
                    "rows": qt.num_rows,
                    "values": qt["value"].to_pylist()}

t0 = time.monotonic()
n = grouped_distinct_count(ds, key="user_id", col="item").count()
out["distinct"] = {"sec": round(time.monotonic() - t0, 2), "rows": n}

t0 = time.monotonic()
n = grouped_quantiles(ds, key="bucket", col="value",
                      qs=[0.5, 0.9, 0.99]).count()
out["grouped_quantiles"] = {"sec": round(time.monotonic() - t0, 2),
                            "rows": n}

print("CHILD_RESULT " + json.dumps(out))
ray.shutdown()
"""


def synth() -> None:
    if os.path.exists(f"{DATA_DIR}/rows"):
        return
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    n_users = max(N_ROWS // 50, 1)
    shards = 16
    per = N_ROWS // shards
    os.makedirs(f"{DATA_DIR}/rows", exist_ok=True)
    for s in range(shards):
        t = pa.table({
            "rid": np.arange(per, dtype=np.int64) + s * per,
            "user_id": rng.integers(0, n_users, per),
            "bucket": rng.integers(0, 2000, per),
            "ts": rng.integers(0, 3_000_000_000, per),
            "item": rng.integers(0, 100_000, per),
            "cents": rng.integers(0, 1_000_000, per),
            "value": rng.normal(100.0, 42.0, per)})
        pq.write_table(t, f"{DATA_DIR}/rows/part-{s:03d}.parquet")


def run(cpus: int) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, str(cpus), DATA_DIR],
        capture_output=True, text=True, timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(f"child at {cpus} cpus produced no result:\n"
                       f"{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> None:
    synth()
    # bracket the legs with same-minute hardware ceilings (ALU +
    # streaming-memory profiles at exactly this pair's counts) so each
    # op's efficiency reads against what the box delivered DURING the
    # run — the shuffle-bound ops' ceiling is the membw one
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from cpu_calibrate import paired_sample
    cal0 = paired_sample(CPUS_LO, CPUS_HI)
    t_lo = run(CPUS_LO)
    t_hi = run(CPUS_HI)
    cal1 = paired_sample(CPUS_LO, CPUS_HI)
    speedup_denom = CPUS_HI / CPUS_LO
    key = f"max_eff_{CPUS_LO}_to_{CPUS_HI}"
    report = {"n_rows": N_ROWS, "cpus": [CPUS_LO, CPUS_HI],
              "hw_ceiling_alu": round(
                  (cal0["alu"][key] + cal1["alu"][key]) / 2, 3),
              "hw_ceiling_membw": round(
                  (cal0["membw"][key] + cal1["membw"][key]) / 2, 3),
              "calibration_samples": [cal0, cal1],
              "per_op": {}}
    for k in t_lo:
        assert t_lo[k]["rows"] == t_hi[k]["rows"], k
        if "values" in t_lo[k]:  # quantile determinism is exact values
            assert t_lo[k]["values"] == t_hi[k]["values"], k
        eff = (t_lo[k]["sec"] / t_hi[k]["sec"]) / speedup_denom
        report["per_op"][k] = {
            f"t{CPUS_LO}": t_lo[k]["sec"], f"t{CPUS_HI}": t_hi[k]["sec"],
            "rows": t_lo[k]["rows"],
            "scaling_efficiency": round(eff, 3),
            "eff_vs_membw_ceiling": round(
                eff / report["hw_ceiling_membw"], 3)}
    print(json.dumps(report))
    path = "BENCH/scaling_r5_analytics.json"
    if os.path.isdir("BENCH"):
        # protocol text stays pair-agnostic: each run records its own
        # "cpus" and its efficiency divisor is cpus[1]/cpus[0]
        doc = {"protocol": (
            "tools/bench_analytics.py — fresh ray.init child "
            "processes at each run's cpus=[lo, hi] (calibrated "
            "within-capacity pairs, see BASELINE.md), deterministic "
            "seeded synthetic input, per-op wall + (t_lo/t_hi)/"
            "(hi/lo); row counts (and exact quantile VALUES) "
            "asserted identical across CPU counts"),
            "runs": []}
        if os.path.exists(path):
            try:
                with open(path) as f:
                    prev = json.load(f)
                doc["runs"] = list(prev.get("runs", []))
            except Exception:
                pass
        # replace only a rerun of the SAME (size, cpu-pair) config
        key = (N_ROWS, [CPUS_LO, CPUS_HI])
        doc["runs"] = [r for r in doc["runs"]
                       if (r.get("n_rows"), r.get("cpus")) != key] \
            + [report]
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
