"""Hardware calibration for the scaling protocol: measure what this
box's "CPUs" can actually deliver for an embarrassingly-parallel pure
Python/CPU workload at several process counts.

Motivation (round 4): the 8-vs-32-CPU scaling legs plateaued even on
stages with perfect parallel structure.  This burn test showed the
machine executes 32 concurrent processes only ~2.6x faster than 8
(typical 16-physical-core + SMT topology / hypervisor caps): the
MAXIMUM achievable (t8/t32)/4 on this hardware is ~0.65 for ANY
workload, so the N->4N protocol must use a pair that fits physical
cores (4 -> 16).  Run this before changing the protocol pair on a new
machine.

Usage: python tools/cpu_calibrate.py   # one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

QUANTUM = 30_000_000


def _burn(_: int) -> float:
    t0 = time.time()
    x = 0
    for i in range(QUANTUM):
        x += i & 7
    return time.time() - t0


def calibrate(counts=(1, 2, 4, 8, 16, 32)) -> dict:
    out = {}
    for n in counts:
        with mp.Pool(n) as p:
            t0 = time.time()
            p.map(_burn, range(n))
            wall = time.time() - t0
        out[str(n)] = round(n / wall, 2)  # tasks/sec
    res = {"metric": "cpu_parallel_throughput_tasks_per_sec",
           "throughput": out}
    for lo, hi in ((8, 32), (4, 16), (2, 8)):
        if str(lo) in out and str(hi) in out:
            res[f"max_eff_{lo}_to_{hi}"] = round(
                out[str(hi)] / out[str(lo)] / (hi / lo), 3)
    return res


if __name__ == "__main__":
    print(json.dumps(calibrate()))
