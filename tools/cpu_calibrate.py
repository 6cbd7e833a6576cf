"""Hardware calibration for the scaling protocol: measure what this
box's "CPUs" can actually deliver at several process counts, for BOTH
resource profiles an engine stage can be bound by:

- ``alu``: embarrassingly-parallel pure-Python integer burn (scheduler
  / core capacity — the round-4 probe).
- ``membw``: streaming memory copies over arrays far larger than LLC
  (the profile of shuffle/object-store-bound stages: pair-distinct
  sort, union shuffles, scorer payload movement).

Motivation (round 4): the 8-vs-32 scaling legs plateaued even on
stages with perfect parallel structure; the ALU burn showed ~19
effective cores (max (t8/t32)/4 ≈ 0.65 for ANY workload).  Round 4's
open question was whether the persistent ~0.6 readings on the 4→16
pair are engine-structural or bandwidth-bound — prose said
"bandwidth-bound"; this tool now MEASURES it: the membw profile gives
the ceiling a shuffle-dominated stage can reach, and ``--paired``
takes a quick same-minute sample (both profiles at the protocol pair's
two counts) so a scaling run can bracket its legs with simultaneous
hardware ceilings instead of a calibration from another day.

Usage:
  python tools/cpu_calibrate.py            # full curve, one JSON line
  python tools/cpu_calibrate.py --paired 4 16   # quick bracket sample
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

QUANTUM = 30_000_000
# 64 MiB src + dst per worker — far over any LLC, small vs RAM at 32
# workers (4 GiB total); 16 round-trip passes move 2 GiB per task
MEM_WORDS = 8_000_000
MEM_PASSES = 16


def _burn(_: int) -> float:
    t0 = time.time()
    x = 0
    for i in range(QUANTUM):
        x += i & 7
    return time.time() - t0


def _mem_burn(_: int) -> float:
    import numpy as np
    src = np.ones(MEM_WORDS, dtype=np.float64)
    dst = np.empty_like(src)
    t0 = time.time()
    for _ in range(MEM_PASSES):
        dst[:] = src
        src[:] = dst
    return time.time() - t0


_PROFILES = {"alu": _burn, "membw": _mem_burn}


def _throughput(fn, n: int) -> float:
    with mp.Pool(n) as p:
        t0 = time.time()
        p.map(fn, range(n))
        wall = time.time() - t0
    return round(n / wall, 2)  # tasks/sec


def calibrate(counts=(1, 2, 4, 8, 16, 32),
              profiles=("alu", "membw")) -> dict:
    res: dict = {"metric": "cpu_parallel_throughput_tasks_per_sec"}
    for prof in profiles:
        out = {str(n): _throughput(_PROFILES[prof], n) for n in counts}
        res[prof] = {"throughput": out}
        for lo, hi in ((8, 32), (4, 16), (2, 8)):
            if str(lo) in out and str(hi) in out:
                res[prof][f"max_eff_{lo}_to_{hi}"] = round(
                    out[str(hi)] / out[str(lo)] / (hi / lo), 3)
    # backwards compat: round-4 readers expect top-level alu numbers
    if "alu" in res:
        res["throughput"] = res["alu"]["throughput"]
        for k, v in res["alu"].items():
            if k.startswith("max_eff_"):
                res[k] = v
    return res


def paired_sample(lo: int, hi: int) -> dict:
    """One quick bracket sample (~30 s): both profiles at exactly the
    protocol pair's two counts, stamped, for same-minute ceilings."""
    out = calibrate(counts=(lo, hi))
    out["pair"] = [lo, hi]
    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    return out


if __name__ == "__main__":
    if "--paired" in sys.argv:
        i = sys.argv.index("--paired")
        lo, hi = int(sys.argv[i + 1]), int(sys.argv[i + 2])
        print(json.dumps(paired_sample(lo, hi)))
    else:
        print(json.dumps(calibrate()))
