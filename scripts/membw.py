"""STREAM-triad-style aggregate memory bandwidth vs process count.

Evidence for BASELINE.md's bandwidth-saturation claim: if aggregate
GB/s flattens well before 32 processes, memory-bound pipeline stages
cannot scale past that point on ONE box (a multi-node cluster adds a
memory bus per node). Pure numpy + multiprocessing — no Ray.

Usage: python scripts/membw.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np

N = 32_000_000  # 3 arrays x 256 MB/process working set


def triad(q, iters=8):
    a = np.zeros(N)
    b = np.random.default_rng(1).random(N)
    c = np.random.default_rng(2).random(N)
    # warm-up (faults pages)
    np.add(b, c, out=a)
    t0 = time.perf_counter()
    for _ in range(iters):
        np.multiply(c, 3.0, out=a)
        np.add(a, b, out=a)   # a = b + 3c : 3 arrays touched / pass
    dt = time.perf_counter() - t0
    q.put(iters * 3 * N * 8 / dt)


def measure(procs: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=triad, args=(q,)) for _ in range(procs)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / 1e9


if __name__ == "__main__":
    out = {}
    for procs in (1, 2, 4, 8, 16, 32):
        out[procs] = round(measure(procs), 1)
        print(json.dumps({"procs": procs, "aggregate_GBps": out[procs]}), flush=True)
    base = out[1]
    print(json.dumps({"speedup_vs_1": {k: round(v / base, 2) for k, v in out.items()}}))
