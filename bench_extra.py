#!/usr/bin/env python3
"""Round-6 optimization measurement harness (guide §1).

NOT the official bench — ``bench.py`` is frozen for measurement. This tool
isolates per-query computation with the noop sink, reports median-of-N
seconds per query, and captures ``explain("formatted")`` plans to
``plans/r06/<query>_<tag>.txt`` so before/after plan diffs are reviewable
without running Spark.

Usage:
    python bench_extra.py [query ...] --sf-dir /root/testdata/sf1.0 \
        --reps 3 --explain-dir plans/r06 --tag before --out /tmp/before.json
"""

from __future__ import annotations

import argparse
import io
import json
import os
import statistics
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE_QUERIES, shuffle_partitions_for  # noqa: E402
from starchart_spark.queries import QUERIES  # noqa: E402
from starchart_spark.session import get_spark  # noqa: E402


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="default: bench.py HEADLINE_QUERIES")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    names = args.queries or HEADLINE_QUERIES
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_urls = 20_000_000 if "0.1" in args.sf_dir else 2_000_000
    spark = get_spark(
        app_name="starchart-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle_partitions_for(cpus, n_urls),
    )
    results: dict[str, dict] = {}
    for name in names:
        fn, _ = QUERIES[name]
        df = fn(spark, args.sf_dir)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            with open(os.path.join(args.explain_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(explain_str(df))
        spark.sparkContext.setJobDescription(f"{name} [{args.tag}]")
        if not args.no_warmup:
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = {"median": round(statistics.median(times), 3), "reps": times}
        print(f"{name}: median={results[name]['median']} reps={times}", flush=True)
    summary = {
        "sf_dir": args.sf_dir,
        "cpus": cpus,
        "tag": args.tag,
        "queries": {k: v["median"] for k, v in results.items()},
        "reps": {k: v["reps"] for k, v in results.items()},
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    print(json.dumps({k: v["median"] for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
