"""Engine per-batch cadence sample (BENCH.md protocol, rounds 4-5).

One SAMPLE = a fresh JVM running a 6-batch e2e crawl (4 forges x 100
repos, page size 20 -> 5 pages + 1 empty-terminator batch) at local[8]
with 16 shuffle partitions, timing each ``_run_batch`` call directly so
startup/init (session build, init_state, bloom seed count) is excluded.
Prints ONE JSON line::

    {"per_batch_s": [...], "mean_s": ..., "median_s": ..., "n_batches": 6}

The box has documented ~2x ambient noise bursts (NOTES.md), so a single
sample is untrustworthy: the protocol is >=3 samples per build,
INTERLEAVED A/B when comparing builds (old/new/old/new...), compare
medians of the per-sample means. To point a sample at a different build::

    python cadence_bench.py --code /tmp/r4code   # sys.path prepend

where /tmp/r4code holds ``git archive <sha> | tar -x`` of the other
build. Fresh process per sample keeps JVM/codegen caches honest.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default=None, help="prepend this dir to sys.path")
    ap.add_argument("--forges", type=int, default=4)
    ap.add_argument("--repos", type=int, default=100)
    ap.add_argument("--page-size", type=int, default=20)
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--shuffle-partitions", type=int, default=16)
    args = ap.parse_args()
    if args.code:
        sys.path.insert(0, args.code)

    from pyspark.sql import functions as F

    from starchart_spark.crawl.corpus import CorpusSpec, make_corpus
    from starchart_spark.crawl.engine import CrawlEngine, CrawlSettings
    from starchart_spark.session import get_spark
    from starchart_spark.testing import corpus_to_spark

    spark = get_spark(
        app_name="cadence-bench",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    spec = CorpusSpec(
        n_forges=args.forges,
        repos_per_forge=args.repos,
        page_size=args.page_size,
    )
    dfs = corpus_to_spark(spark, make_corpus(spec))

    wh = tempfile.mkdtemp(prefix="cadence_wh_")
    eng = CrawlEngine(
        spark,
        wh,
        CrawlSettings(host_buckets=8, items_per_api_call=args.page_size),
    )
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    docs = dfs["documents"].withColumn("host_bucket", eng._bucket("hostname"))

    timings: list[float] = []
    jobs: list[int] = []
    stages: list[int] = []
    ds = spark.sparkContext._jsc.sc().dagScheduler()
    orig = CrawlEngine._run_batch

    def timed(self, *a, **kw):
        j0, s0 = ds.nextJobId(), ds.nextStageId()
        t0 = time.monotonic()
        out = orig(self, *a, **kw)
        timings.append(time.monotonic() - t0)
        jobs.append(ds.nextJobId() - j0)
        stages.append(ds.nextStageId() - s0)
        return out

    CrawlEngine._run_batch = timed  # type: ignore[method-assign]
    try:
        eng.run(documents=docs, max_batches=50)
    finally:
        CrawlEngine._run_batch = orig  # type: ignore[method-assign]

    print(
        json.dumps(
            {
                "per_batch_s": [round(t, 3) for t in timings],
                "mean_s": round(statistics.mean(timings), 3),
                "median_s": round(statistics.median(timings), 3),
                "n_batches": len(timings),
                "jobs_per_batch": jobs,
                "stages_per_batch": stages,
                "code": args.code or "worktree",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
