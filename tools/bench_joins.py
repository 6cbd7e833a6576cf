"""Scaling bench for the union-shuffle join family (as-of, interval,
semi) — the round-4 additions that never appear in bench.py's
flagship path.

Synthesizes a deterministic events-like corpus ONCE to /tmp parquet
(seeded numpy; no external data), then runs each join at two CPU
counts in FRESH child processes (the repo's calibrated protocol pair,
see BENCH/BASELINE.md: 2→8 on this hypervisor) and reports per-join
wall plus strong-scaling efficiency (t_lo / t_hi) / (hi / lo).

Usage: python tools/bench_joins.py [n_left] [cpus_lo] [cpus_hi]
Writes BENCH/scaling_r4_joins.json when run from the repo root.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_LEFT = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
CPUS_LO = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CPUS_HI = int(sys.argv[3]) if len(sys.argv) > 3 else 8
DATA_DIR = f"/tmp/bench_joins_{N_LEFT}"

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
from dedupe_api_ray.stages.asof import asof_join
from dedupe_api_ray.stages.ranges import interval_join
from dedupe_api_ray.stages.semi import anti_join

left = ray.data.read_parquet(f"{data_dir}/left")
right = ray.data.read_parquet(f"{data_dir}/right")
out = {}

t0 = time.monotonic()
n = asof_join(left, right, left_on="user_id", left_ts="ts",
              right_cols=["rid", "w"], right_tiebreak="rid").count()
out["asof"] = {"sec": round(time.monotonic() - t0, 2), "rows": n}

t0 = time.monotonic()
n = interval_join(left, right, left_on="user_id", left_ts="ts",
                  right_start="ts", right_end="ts_end",
                  right_cols=["rid"]).count()
out["interval"] = {"sec": round(time.monotonic() - t0, 2), "rows": n}

t0 = time.monotonic()
import pyarrow.compute as pc
high = right.map_batches(lambda t: t.filter(pc.greater(t["w"], 1.2)),
                         batch_format="pyarrow")
n = anti_join(left, high, left_on="user_id").count()
out["anti"] = {"sec": round(time.monotonic() - t0, 2), "rows": n}

print("CHILD_RESULT " + json.dumps(out))
ray.shutdown()
"""


def synth() -> None:
    if os.path.exists(f"{DATA_DIR}/right"):
        return
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    n_users = max(N_LEFT // 40, 1)
    n_right = N_LEFT // 4
    for side, n, shards in (("left", N_LEFT, 16), ("right", n_right, 8)):
        os.makedirs(f"{DATA_DIR}/{side}", exist_ok=True)
        per = n // shards
        for s in range(shards):
            uid = rng.integers(0, n_users, per)
            ts = rng.integers(0, 3_000_000_000, per)  # ~us over a month
            if side == "left":
                t = pa.table({"user_id": uid, "ts": ts,
                              "event_id": np.arange(per) + s * per})
            else:
                t = pa.table({"user_id": uid, "ts": ts,
                              "ts_end": ts + 20_000_000,  # 20s windows
                              "rid": np.arange(per) + s * per,
                              "w": rng.normal(size=per)})
            pq.write_table(t, f"{DATA_DIR}/{side}/part-{s:03d}.parquet")


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
    t_lo = run(CPUS_LO)
    t_hi = run(CPUS_HI)
    speedup_denom = CPUS_HI / CPUS_LO
    report = {"n_left": N_LEFT, "cpus": [CPUS_LO, CPUS_HI],
              "per_join": {}}
    for k in t_lo:
        assert t_lo[k]["rows"] == t_hi[k]["rows"], k  # determinism
        eff = (t_lo[k]["sec"] / t_hi[k]["sec"]) / speedup_denom
        report["per_join"][k] = {
            f"t{CPUS_LO}": t_lo[k]["sec"], f"t{CPUS_HI}": t_hi[k]["sec"],
            "rows": t_lo[k]["rows"],
            "scaling_efficiency": round(eff, 3)}
    print(json.dumps(report))
    if os.path.isdir("BENCH"):
        with open("BENCH/scaling_r4_joins.json", "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
