"""Spark-free memory-bandwidth probe for the scaling-efficiency story.

The remaining 4-executor per-task inflation in BENCH/BASELINE.md
(zero spill, low GC, no skew — yet p50 grows ~1.35x when 32 NumPy/Arrow
workers run instead of 8) is attributed to the ONE box's shared memory
bus. This measures that directly, with no Spark in the loop: N
independent processes (taskset-pinned to distinct cores) each stream a
private 512 MB float64 array through numpy reductions; aggregate GB/s
vs N shows how much bandwidth a 4x core scale-up actually buys on this
machine. A real N -> 4N cluster resize multiplies memory channels with
nodes; this box cannot.

Usage: python scripts/bench_membw.py [sizes_mb] — prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

MB = 512
ROUNDS = 6


def _worker(core: int, q: "mp.Queue") -> None:
    os.sched_setaffinity(0, {core})
    a = np.random.RandomState(core).rand(MB * 1024 * 1024 // 8)
    a.sum()  # touch pages
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(ROUNDS):
        s += float(a.sum())
    dt = time.perf_counter() - t0
    q.put((core, ROUNDS * a.nbytes / dt / 1e9, s))


def measure(n_threads: int) -> float:
    q: "mp.Queue" = mp.Queue()
    procs = [mp.Process(target=_worker, args=(i, q))
             for i in range(n_threads)]
    for p in procs:
        p.start()
    rates = [q.get()[1] for _ in procs]
    for p in procs:
        p.join()
    return sum(rates)


def main() -> None:
    out = {}
    for n in (1, 8, 32):
        out[str(n)] = round(measure(n), 2)
    r8, r32 = out["8"], out["32"]
    print(json.dumps({
        "metric": "aggregate numpy read bandwidth GB/s by process count",
        "bandwidth_gbps": out,
        "scale_8_to_32": round(r32 / r8, 3),
        "per_core_retention": round((r32 / 32) / (r8 / 8), 3),
        "note": "per-task slowdown floor for memory-bound kernels at "
                "4x cores on this ONE box; a real 4x-node resize adds "
                "memory channels instead",
    }))


if __name__ == "__main__":
    main()
