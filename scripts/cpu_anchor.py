"""Single-thread CPU anchor — a host-epoch comparator for bench records.

Bench numbers on this shared host swing with BOTH transient load bursts
(visible in the recorded `load` field) and hypervisor CPU-delivery
changes that are invisible to loadavg (probed r13: the loop below swung
2.5-3.9 s at load < 2 while every query in a subset22 probe read a
uniform ~1.5-2x of its committed calm number). Before adjudicating a
cross-round bench delta as a code regression, run this and compare
against the anchors recorded in the round reports: if the anchor moved,
the host did.

Methodology: 5 reps of a fixed 20M-iteration integer loop in CPython
(immune to Spark, JIT state, page cache and disk), plus a 10 s
/proc/stat steal sample under a full-width multiprocessing burn.
Recorded anchors (min of 5 / burn-steal cores):

- r13 session 4 (2026-08-18, Xeon @2.70GHz x32): loop min 2.546 s,
  later the SAME session 3.137-3.945 s; steal under burn 1.24 cores.
  The committed BENCH_detail_local.json calm record (143.7 s headline)
  predates this epoch and was never reproduced in it (7 attempts,
  190-273 s, median per-query inflation 1.29-1.49x, disjoint victims).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time


def loop_once(n: int = 20_000_000) -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(n):
        x += i * i
    return time.perf_counter() - t0


def _burn(stop_t: float) -> None:
    x = 0
    while time.time() < stop_t:
        for i in range(100_000):
            x += i * i


def _stat() -> list[int]:
    with open("/proc/stat") as fh:
        return list(map(int, fh.readline().split()[1:]))


def steal_under_burn(seconds: float = 10.0) -> dict[str, float]:
    ncpu = os.cpu_count() or 1
    stop = time.time() + seconds + 2
    procs = [mp.Process(target=_burn, args=(stop,)) for _ in range(ncpu)]
    for p in procs:
        p.start()
    time.sleep(1)
    a = _stat()
    t0 = time.time()
    time.sleep(seconds)
    b = _stat()
    el = time.time() - t0
    for p in procs:
        p.join()
    d = [y - x for x, y in zip(a, b)]
    hz = os.sysconf("SC_CLK_TCK")
    return {
        "busy_cores": round((d[0] + d[2]) / hz / el, 2),
        "steal_cores": round(d[7] / hz / el, 2),
        "idle_cores": round(d[3] / hz / el, 2),
    }


def main() -> None:
    reps = [round(loop_once(), 3) for _ in range(5)]
    out: dict[str, object] = {
        "loop_reps_sec": reps,
        "loop_min_sec": min(reps),
        "load1": round(os.getloadavg()[0], 2),
    }
    try:
        out.update(steal_under_burn())
    except OSError:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
