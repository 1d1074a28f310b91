"""Host memory-bandwidth probe — quantifies the shared-VM interference
that BENCH.md's protocol exists to survive. Runs one memory-bound
kernel (40 MB array, 20 scaled-sum passes) solo and then 32-way
concurrent; on a healthy dedicated 32-core box the 32-way median is
2-4x the solo wall (shared LLC/DRAM), while on a bandwidth-starved or
noisy-neighbor instance it reaches 10-20x — which inflates every
shuffle/scan-heavy Spark stage by the same factor WITHOUT showing up
in load average or steal time. Record its output next to any bench
record so cross-round wall-clock comparisons are interpretable.

Usage: python tools/host_probe.py
Prints one JSON line: {"solo_s": ..., "par32_median_s": ...,
"bandwidth_contention_x": ...}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np


def _work(_i: int) -> float:
    a = np.random.rand(5_000_000)  # 40 MB
    t0 = time.time()
    s = 0.0
    for _ in range(20):
        s += (a * 1.0000001).sum()
    return time.time() - t0


def main() -> None:
    # pool sized to the host (r6 advisory fix): a fixed 32-process pool
    # on a smaller box conflates CPU oversubscription with memory-
    # bandwidth contention; the emitted record carries the pool size and
    # core count so cross-host readings stay comparable
    import os

    pool_n = min(32, os.cpu_count() or 1)
    solo = _work(0)
    with mp.Pool(pool_n) as p:
        walls = p.map(_work, range(pool_n))
    med = sorted(walls)[len(walls) // 2]
    print(
        json.dumps(
            {
                "solo_s": round(solo, 3),
                "pool_n": pool_n,
                "cpu_count": os.cpu_count(),
                "par_median_s": round(med, 3),
                "bandwidth_contention_x": round(med / solo, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
