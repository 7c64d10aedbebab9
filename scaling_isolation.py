#!/usr/bin/env python3
"""Scaling isolation control (VERDICT r2 'do this' #8).

Question: is the flat 8→32-core rung in SCALING.json a property of the
PIPELINE (it stops scaling past 8 threads) or of this BOX (one DRAM bus
saturates)? membw.py already shows the bus itself only scales 0.55 from 8
to 32 threads; this experiment isolates the pipeline directly:

- solo:       one 8-core frontier run, CPU-pinned (taskset) → T_solo
- concurrent: TWO 8-core frontier runs at once, pinned to DISJOINT CPU
  sets, sharing only the memory bus → T_a + T_b aggregate

If the pipeline were the limiter, the aggregate would stay ≈ T_solo (the
second instance would add nothing). If the bus/box is the limiter, the
aggregate approaches 2·T_solo scaled by whatever the bus gives — i.e. the
pipeline itself scales and the hardware does not. Efficiency reported =
(T_a + T_b) / (2·T_solo).

NOTE this deliberately violates the repo's 'never run two Spark JVMs
concurrently when timing' rule — concurrent interference IS the measured
quantity here, not noise. Numbers from the concurrent phase must never be
quoted as single-run throughput.

Writes SCALING_ISOLATION.json. Run serially with nothing else on the box:
    python scaling_isolation.py [--urls 50000000] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

# disjoint 8-CPU sets; 0-7 vs 16-23 keeps distance in the CPU numbering
# (on common 16-core/32-thread SMT layouts this lands on distinct cores)
SET_A = "0-7"
SET_B = "16-23"


def run_frontier(cpuset: str, urls: int, tag: str) -> subprocess.Popen:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="8",
        STARCHART_BENCH_URLS=str(urls),
        STARCHART_BENCH_REPS="1",
        STARCHART_BENCH_SKIP_QUERIES="1",
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
        STARCHART_DRIVER_MEM="24g",
        STARCHART_LOCAL_DIR=f"/dev/shm/spark-iso-{tag}",
    )
    return subprocess.Popen(
        ["taskset", "-c", cpuset, sys.executable, os.path.join(REPO, "bench.py")],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        env=env,
        text=True,
    )


def throughput(proc: subprocess.Popen) -> float:
    out, _ = proc.communicate(timeout=900)
    line = [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
    return float(json.loads(line)["value"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--urls", type=int, default=50_000_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    solo, concurrent = [], []
    for rep in range(args.reps):
        # solo 8-core run, pinned to set A
        solo.append(throughput(run_frontier(SET_A, args.urls, "solo")))
        # two concurrent 8-core runs on disjoint sets
        pa = run_frontier(SET_A, args.urls, "a")
        pb = run_frontier(SET_B, args.urls, "b")
        ta, tb = throughput(pa), throughput(pb)
        concurrent.append({"a": ta, "b": tb, "aggregate": ta + tb})
        print(
            f"rep {rep}: solo={solo[-1]:.0f}  conc_a={ta:.0f} conc_b={tb:.0f} "
            f"agg={ta + tb:.0f}",
            file=sys.stderr,
        )

    med_solo = statistics.median(solo)
    med_agg = statistics.median(c["aggregate"] for c in concurrent)
    eff = round(med_agg / (2 * med_solo), 3)
    out = {
        "metric": "pipeline-vs-bus isolation: aggregate of two concurrent "
        "pinned 8-core runs vs 2x one solo 8-core run",
        "n_urls": args.urls,
        "reps": args.reps,
        "cpu_sets": [SET_A, SET_B],
        "solo_urls_per_sec": solo,
        "concurrent": concurrent,
        "median_solo": med_solo,
        "median_aggregate": med_agg,
        "isolation_efficiency": eff,
        "interpretation": (
            "efficiency near 1.0 = the pipeline scales with added cores and "
            "the shared memory bus (membw.py: 0.55 bus scaling 8->32) is what "
            "flattens the single-JVM 8->32 rung; efficiency near 0.5 = the "
            "bus was already saturated by one 8-core run"
        ),
    }
    with open(os.path.join(REPO, "SCALING_ISOLATION.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
