"""Probe hypervisor CPU steal under full parallel load.

The shared box this repo is benchmarked on intermittently denies a large
fraction of requested cycles under 32-way load while looking idle/healthy
to short single-core sentinels (observed 2026-08-19: 9-15% raw steal while
the VM was only ~30% busy, i.e. ~40% of *requested* cycles stolen — index
build 13.8 s -> 21-29 s with zero code change).  bench.py's sentinels run
at the start of a run; this probe measures the steal regime directly so a
final benchmark run can be scheduled in a calm window.

Prints one JSON line: {"steal_frac": stolen/(busy+stolen) under load,
"busy_frac": ..., "wall": ...}.  steal_frac <= ~0.05 is a calm window.
"""
import json
import multiprocessing as mp
import time


def _burn(seconds: float) -> None:
    import numpy as np

    a = np.random.default_rng(0).random(1_000_000)
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        np.sort(a)


def _cpu_times():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # user nice system idle iowait irq softirq steal
    vals = [int(x) for x in parts[1:9]]
    busy = vals[0] + vals[1] + vals[2] + vals[5] + vals[6]
    idle = vals[3] + vals[4]
    steal = vals[7]
    return busy, idle, steal


def measure(seconds: float = 8.0, nproc: int = 32) -> dict:
    b0, i0, s0 = _cpu_times()
    t0 = time.perf_counter()
    procs = [mp.Process(target=_burn, args=(seconds,)) for _ in range(nproc)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    wall = time.perf_counter() - t0
    b1, i1, s1 = _cpu_times()
    busy, idle, steal = b1 - b0, i1 - i0, s1 - s0
    tot = busy + idle + steal
    return {
        "steal_frac": round(steal / max(busy + steal, 1), 4),
        "busy_frac": round(busy / max(tot, 1), 4),
        "raw_steal_pct": round(100.0 * steal / max(tot, 1), 2),
        "wall": round(wall, 2),
    }


if __name__ == "__main__":
    print(json.dumps(measure()))
