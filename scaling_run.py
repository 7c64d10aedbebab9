#!/usr/bin/env python3
"""Robust in-process scaling measurement: alternate local[8]/local[32] runs
of the frontier pipeline (with warmup), take medians, write SCALING.json.
Run ALONE — concurrent JVMs corrupt the numbers."""

from __future__ import annotations

import json
import statistics
import sys

import bench


def run(cores: int, n_urls: int) -> float:
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
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    lo_runs, hi_runs = [], []
    for i in range(reps):
        print(f"rep {i + 1}/{reps}", file=sys.stderr)
        lo_runs.append(run(lo, n_urls))
        hi_runs.append(run(hi, n_urls))
    t_lo = statistics.median(lo_runs)
    t_hi = statistics.median(hi_runs)
    eff = (t_hi / t_lo) / (hi / lo)
    out = {
        "metric": f"frontier throughput scaling efficiency (N={lo} vs {hi} cores)",
        "n_urls": n_urls,
        "reps": reps,
        f"urls_per_sec@{lo}": lo_runs,
        f"urls_per_sec@{hi}": hi_runs,
        f"median@{lo}": t_lo,
        f"median@{hi}": t_hi,
        "efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(out))
    with open("SCALING.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
