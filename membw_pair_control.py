#!/usr/bin/env python3
"""Hardware scaling ceiling for the executor protocol (run ALONE).

Mirrors scaling_executors.py's exact CPU topology with a PURE DRAM-bound
workload (membw.py stream-copy): one pinned 2-core instance solo, then four
concurrent pinned 2-core instances on the quad sets. The ratio

    ceiling = aggregate(quad) / (4 x solo)

is the best efficiency ANY memory-bound job can post on this box at that
topology — the box has one memory bus and one shared L3, so four executors
contend for what a real 4-node cluster multiplies by 4. Reporting the
pipeline's efficiency alongside this ceiling separates software scaling
(what the north rule tests) from single-box bus physics (what it does not).

Writes/updates the `hardware_ceiling` key in SCALING_EXECUTORS.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
CPU_SETS = ["0-1", "8-9", "16-17", "24-25"]  # keep identical to scaling_executors


def run_pinned(cpuset: str) -> subprocess.Popen:
    # membw.py ladder "2" = two stream-copy workers; taskset pins both to
    # the executor's 2-CPU set, exactly like the bench JVMs
    return subprocess.Popen(
        ["taskset", "-c", cpuset, sys.executable, os.path.join(REPO, "membw.py"), "2"],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )


def gb_s(proc: subprocess.Popen) -> float:
    out, _ = proc.communicate(timeout=120)
    return float(json.loads(out.strip().splitlines()[-1])["aggregate_gb_s"]["2"])


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rows = []
    for rep in range(reps):
        solo = gb_s(run_pinned(CPU_SETS[0]))
        quad_procs = [run_pinned(cs) for cs in CPU_SETS]
        quad = [gb_s(p) for p in quad_procs]
        agg = sum(quad)
        ceiling = agg / (4 * solo)
        rows.append(
            {"solo_gb_s": solo, "quad_gb_s": quad, "aggregate_gb_s": round(agg, 1),
             "ceiling": round(ceiling, 3)}
        )
        print(f"rep {rep}: solo={solo:.1f} agg={agg:.1f} ceiling={ceiling:.3f}",
              file=sys.stderr)
    med = round(statistics.median(r["ceiling"] for r in rows), 3)
    out = {"cpu_sets": CPU_SETS, "per_rep": rows, "median_ceiling": med,
           "workload": "membw.py stream-copy, 2 pinned workers per executor slot"}
    path = os.path.join(REPO, "SCALING_EXECUTORS.json")
    try:
        with open(path) as f:
            sc = json.load(f)
        sc["hardware_ceiling"] = out
        with open(path, "w") as f:
            json.dump(sc, f, indent=2)
    except (OSError, json.JSONDecodeError):
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
