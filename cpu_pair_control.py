#!/usr/bin/env python3
"""Pure-CPU pair control for the executor-scaling protocol.

`membw_pair_control.py` showed the pinned 1-vs-4 topology scales a pure
DRAM stream at ~0.99 — the memory bus is not the limiter. But a DRAM-bound
stream is insensitive to the OTHER single-box capacity effect: effective
per-core compute rate dropping when more cores go busy (hypervisor CPU
oversubscription / steal, all-core turbo limits). This control measures
exactly that: a compute-bound kernel (in-cache numpy matmul, ~zero DRAM
traffic) run as one pinned 2-core instance vs four concurrent pinned
2-core instances on the same disjoint CPU sets the scaling protocol uses,
plus /proc/stat steal-time deltas for each phase.

If this control reads < 1.0, that fraction of the Spark protocol's
"inefficiency" is the box's compute capacity under load — a single-VM
artifact that four separate cluster hosts (own sockets, own thermal and
scheduling envelopes) do not share — and NOT pipeline behavior.

Run ALONE:  python cpu_pair_control.py [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

CPU_SETS = ["0-1", "8-9", "16-17", "24-25"]
SECONDS = float(os.environ.get("STARCHART_CPU_CONTROL_SECONDS", "20"))

_WORKER = r"""
import time, numpy as np
import sys
n = 96  # 96x96 f64 ~ 73 KB/operand: L2-resident, DRAM-silent
a = np.random.default_rng(0).standard_normal((n, n))
b = np.random.default_rng(1).standard_normal((n, n))
t_end = time.time() + float(sys.argv[1])
ops = 0
while time.time() < t_end:
    for _ in range(200):
        a @ b
    ops += 200
print(ops)
"""


def _steal_jiffies() -> int:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[8])  # cpu  user nice system idle iowait irq softirq steal


def _launch(cpuset: str) -> subprocess.Popen:
    env = dict(os.environ, OMP_NUM_THREADS="2", OPENBLAS_NUM_THREADS="2",
               MKL_NUM_THREADS="2")
    return subprocess.Popen(
        ["taskset", "-c", cpuset, sys.executable, "-c", _WORKER, str(SECONDS)],
        stdout=subprocess.PIPE, text=True, env=env,
    )


def _rate(proc: subprocess.Popen) -> float:
    out, _ = proc.communicate(timeout=SECONDS * 3)
    return int(out.strip()) / SECONDS


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rows = []
    for rep in range(reps):
        s0 = _steal_jiffies()
        solo = _rate(_launch(CPU_SETS[0]))
        s1 = _steal_jiffies()
        quad_procs = [_launch(cs) for cs in CPU_SETS]
        quad = [_rate(p) for p in quad_procs]
        s2 = _steal_jiffies()
        eff = sum(quad) / (4 * solo)
        rows.append({
            "solo_ops_s": round(solo, 1),
            "quad_ops_s": [round(q, 1) for q in quad],
            "efficiency": round(eff, 3),
            "steal_jiffies_solo_phase": s1 - s0,
            "steal_jiffies_quad_phase": s2 - s1,
        })
        print(f"rep {rep}: solo={solo:.0f} quad_agg={sum(quad):.0f} "
              f"eff={eff:.3f} steal={s1 - s0}/{s2 - s1}", file=sys.stderr)
    out = {
        "metric": "pure-CPU (L2-resident matmul) scaling efficiency, "
                  "1 vs 4 pinned 2-core instances — compute-capacity control "
                  "for SCALING_EXECUTORS.json",
        "cpu_sets": CPU_SETS,
        "seconds_per_phase": SECONDS,
        "per_rep": rows,
        "median_efficiency": round(
            statistics.median(r["efficiency"] for r in rows), 3
        ),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "SCALING_CPU_CONTROL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
