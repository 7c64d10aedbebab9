#!/usr/bin/env python3
"""Memory-bandwidth control experiment for the scaling evidence (BENCH.md).

Pure numpy, no Spark: N worker processes each stream-copy a buffer much
larger than LLC for a fixed wall interval; report AGGREGATE GB/s per N.
If aggregate bandwidth saturates at some N* while per-process bandwidth
falls ~1/N beyond it, the box's DRAM bus — not any software bottleneck —
caps every memory-bound pipeline at that point. That is the hardware fact
behind reporting the north rule's N-vs-4N pair at (2, 8) cores: a real
cluster adds memory buses with executors; one box does not.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

BUF_MB = 256  # far beyond LLC, far below RAM
SECONDS = 3.0


def worker(q: mp.Queue) -> None:
    src = np.empty(BUF_MB * 1024 * 1024 // 8, dtype=np.int64)
    dst = np.empty_like(src)
    src[:] = 1
    # warm placement
    np.copyto(dst, src)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < SECONDS:
        np.copyto(dst, src)
        n += 1
    dt = time.perf_counter() - t0
    # copy moves 2x buffer (read + write)
    q.put(2 * BUF_MB / 1024 * n / dt)


def measure(nproc: int) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=worker, args=(q,)) for _ in range(nproc)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return round(total, 1)


def main() -> None:
    ladder = (
        [int(c) for c in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [1, 2, 4, 8, 16, 32]
    )
    out = {"buf_mb": BUF_MB, "aggregate_gb_s": {}}
    for n in ladder:
        gb = measure(n)
        out["aggregate_gb_s"][str(n)] = gb
        print(f"  {n:3d} procs: {gb} GB/s aggregate", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
