"""Measure this guest's EFFECTIVE CPU budget with a Spark-free burn.

Motivation (round 3): protocol-v3 scaling pairs (2 -> 8 separate
executor JVMs) showed the 4N level capped at ~2100-2500 docs/sec with
guest steal time that GROWS with our own CPU usage (idle ~1%, lo-run
~3%, hi-run ~10% mean with 70% spikes) — the signature of a host-side
vCPU scheduling cap, not random co-tenant noise. This tool measures
where the cap bites: identical pure-CPU work (md5 chains, no memory
pressure, no IPC) run at increasing process counts; aggregate
throughput divided by the 1-process rate gives the effective number of
full-speed vCPUs the host actually grants.

Measured on this box (2026-08-17, quiet window, load < 0.2 at start):

    procs  agg Mops  eff-vs-linear  steal%%
        1      1.45           1.00     0.0
        2      3.14           1.08     0.0
        4      6.15           1.06     0.1
        8     12.01           1.04     0.2
       12     18.05           1.04     0.1
       16     21.08           0.91     3.0
       24     27.99           0.80     8.1
       32     34.98           0.75    10.4

i.e. LINEAR to ~12 runnable threads, then the host throttles (steal
rises in lockstep). A scaling pair whose wide level runs more than ~12
runnable threads therefore measures the HOST CAP, not the engine:
the v3 (2,8) pair's 4N level runs 16 Arrow-feeder+Python threads plus
8 executor-JVM GC/IO threads. This is why the round-3 headline pair is
(1,4) executors — 4N level = 8 runnable + ~5 JVM background threads,
inside the linear zone — the same sizing rule a real deployment uses
(executors per host sized to the cores the host actually delivers).

Usage: python tools/cpu_budget.py  (prints one JSON line per level)
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import time

DUR_SEC = 6.0
LEVELS = [1, 2, 4, 8, 12, 16, 24, 32]


def _burn(dur: float, q: "mp.Queue") -> None:
    h = hashlib.md5(b"x")
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < dur:
        for _ in range(2000):
            h = hashlib.md5(h.digest())
        n += 2000
    q.put(n)


def _stat() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[8]), sum(int(x) for x in parts[1:])


def main() -> None:
    results = []
    for procs in LEVELS:
        q: "mp.Queue" = mp.Queue()
        s0, t0 = _stat()
        w0 = time.perf_counter()
        ps = [mp.Process(target=_burn, args=(DUR_SEC, q))
              for _ in range(procs)]
        for p in ps:
            p.start()
        for p in ps:
            p.join()
        wall = time.perf_counter() - w0
        s1, t1 = _stat()
        agg = sum(q.get() for _ in range(procs)) / wall
        rec = {
            "procs": procs,
            "mops": round(agg / 1e6, 2),
            "per_proc_mops": round(agg / procs / 1e6, 3),
            "steal_pct": round(100.0 * (s1 - s0) / max(t1 - t0, 1), 1),
            "load1": float(open("/proc/loadavg").read().split()[0]),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    base = results[0]["mops"]
    print("\neff vs linear (1-proc rate x procs):")
    for r in results:
        print(f"  {r['procs']:2d}: {r['mops'] / (base * r['procs']):.2f}"
              f"  (steal {r['steal_pct']}%)")


if __name__ == "__main__":
    main()
