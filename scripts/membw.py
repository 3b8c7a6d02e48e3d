"""Measured DRAM bandwidth ceiling for the scaling-efficiency record.

Single-box scaling of string/scan-heavy stages is bounded by socket
memory bandwidth, not cores (BENCH_SCALING.json r2 diagnostics). This
gives that claim its own number: a STREAM-style triad (a = b + s*c over
arrays far larger than LLC) run in P independent taskset-pinned
processes; aggregate GB/s vs P shows where the socket saturates.

Usage: python scripts/membw.py [procs ...]   (default: 1 8 32)
Prints one JSON line: {"levels": {"1": GBps, ...}, "n_doubles": ...}

Counted traffic matches the two-op loop exactly: each iteration does
np.multiply(c, s, out=a) (read c, write a) then np.add(a, b, out=a)
(read a, read b, write a) = 5 arrays * 8 bytes * n. Write-allocate
makes real traffic higher still, so the reported ceiling understates
the hardware.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

N = 16_000_000  # doubles per array: 128 MB, 3 arrays = 384 MB per proc
SECONDS = 2.0


def _triad_child(cpu: int, q, barrier) -> None:
    os.sched_setaffinity(0, {cpu})
    import numpy as np
    a = np.zeros(N)
    b = np.random.default_rng(cpu).random(N)
    c = np.random.default_rng(cpu + 1).random(N)
    np.add(b, c, out=a)  # warm numpy dispatch + first-touch pages
    # all children start their timed window together — without this,
    # early forks time against an idle memory system and overstate
    # the aggregate
    barrier.wait()
    t0 = time.perf_counter()
    it = 0
    while time.perf_counter() - t0 < SECONDS:
        np.multiply(c, 0.5, out=a)
        np.add(a, b, out=a)
        it += 1
    dt = time.perf_counter() - t0
    # per iteration: multiply reads c writes a, add reads a,b writes a
    # -> 5 * 8 * N bytes counted
    q.put(5 * 8 * N * it / dt)


def measure(procs: int) -> float:
    q = mp.Queue()
    barrier = mp.Barrier(procs)
    ps = [mp.Process(target=_triad_child, args=(i, q, barrier))
          for i in range(procs)]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(vals) / 1e9


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [1, 8, 32]
    out = {"n_doubles": N, "seconds": SECONDS, "levels": {}}
    for p in levels:
        out["levels"][str(p)] = round(measure(p), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
