#!/usr/bin/env python3
"""Scaling-efficiency evidence (north_rule: ≥0.8 between N and 4N).

Runs the identical bench job (same synthetic frontier, same SF dir) at two
parallelism levels — local[8] and local[32], the sandbox proxy for N vs 4N
executor clusters — in separate JVMs, and reports normalized throughput
efficiency:

    efficiency = (urls_per_sec@32 / urls_per_sec@8) / (32 / 8)

Writes/updates the scaling section of BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_at(cpus: int, sf_dir: str, n_urls: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        STARCHART_BENCH_URLS=str(n_urls),
        STARCHART_SHUFFLE_PARTITIONS=str(max(cpus, 16)),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_urls = int(os.environ.get("STARCHART_BENCH_URLS", "2000000"))
    lo, hi = 8, 32

    r_lo = run_at(lo, sf_dir, n_urls)
    r_hi = run_at(hi, sf_dir, n_urls)
    t_lo = r_lo["frontier"]["urls_per_sec"]
    t_hi = r_hi["frontier"]["urls_per_sec"]
    eff = (t_hi / t_lo) / (hi / lo)

    result = {
        "metric": "frontier throughput scaling efficiency (N=8 vs 4N=32 cores)",
        "n_urls": n_urls,
        "sf_dir": sf_dir,
        f"urls_per_sec@{lo}": t_lo,
        f"urls_per_sec@{hi}": t_hi,
        "efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "per_query_sec": {f"cpus{lo}": r_lo["queries"], f"cpus{hi}": r_hi["queries"]},
    }
    print(json.dumps(result))
    with open(os.path.join(HERE, "SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
