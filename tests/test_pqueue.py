"""Salted-keyed priority queue (operators/pqueue.py).

Semantics vs the plain-window formulation on a skewed frontier (one host
holding half the rows — exactly the shape the two-pass ranker exists for),
budget-split accounting, top-k pop determinism, and the constant-priority
degenerate case collapsing to the engine's crawl-order slots.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from starchart_spark.operators import politeness, pqueue


def _skewed_frontier(spark, n=600):
    """hosts: mega (50% of rows) + 5 smalls; priority collides across hosts."""
    return (
        spark.range(n)
        .select(
            F.col("id"),
            F.when(F.col("id") % 2 == 0, F.lit("mega"))
            .otherwise(F.concat(F.lit("h"), (F.col("id") % 5).cast("string")))
            .alias("hostname"),
            (F.col("id") % 37).cast("double").alias("priority"),
            F.lit(100).cast("long").alias("effective_rate_ms"),
        )
    )


def _window_truth(df):
    w = Window.partitionBy("hostname").orderBy(
        F.col("priority").desc(), F.col("id").asc()
    )
    return df.withColumn("want_rank", F.row_number().over(w))


def test_rank_equals_plain_window(spark):
    f = _skewed_frontier(spark)
    got = pqueue.pq_rank(f, tiebreak_cols=("id",))
    joined = _window_truth(f).join(got.select("hostname", "id", "pq_rank"), ["hostname", "id"])
    assert joined.filter(F.col("pq_rank") != F.col("want_rank")).count() == 0


def test_schedule_budget_split(spark):
    f = _skewed_frontier(spark)
    sched, deferred = pqueue.pq_schedule(f, budget_ms=1000, tiebreak_cols=("id",))
    sched = sched.persist()
    deferred = deferred.persist()
    # slots: 0,100,...,900 inside the budget => 10 per host (where available)
    per_host = {r["hostname"]: r["n"] for r in
                sched.groupBy("hostname").agg(F.count("*").alias("n")).collect()}
    assert all(n == 10 for n in per_host.values())
    assert sched.agg(F.max("slot_ms")).collect()[0][0] == 900
    assert deferred.agg(F.min("slot_ms")).collect()[0][0] == 1000
    # split is a partition of the input
    assert sched.count() + deferred.count() == f.count()
    # the scheduled half is exactly the per-host top-10 by priority
    top = pqueue.dequeue_topk(f, 10, tiebreak_cols=("id",))
    assert (
        sched.select("hostname", "id").exceptAll(top.select("hostname", "id")).count()
        == 0
    )
    sched.unpersist()
    deferred.unpersist()


def test_unbounded_budget_defers_nothing(spark):
    f = _skewed_frontier(spark, n=100)
    sched, deferred = pqueue.pq_schedule(f, budget_ms=None, tiebreak_cols=("id",))
    assert deferred.count() == 0
    assert sched.count() == 100


def test_constant_priority_collapses_to_crawl_order(spark):
    """With one priority everywhere and (page, idx) tiebreaks, the queue's
    slots ARE the engine's plain-window crawl-order slots."""
    rows = [
        ("h1", 1, i, 200) for i in range(6)
    ] + [("h2", 1, i, 500) for i in range(4)]
    f = spark.createDataFrame(
        rows, ["hostname", "page", "idx_in_page", "effective_rate_ms"]
    ).withColumn("priority", F.lit(0.0))
    sched, _ = pqueue.pq_schedule(
        f, budget_ms=None, tiebreak_cols=("page", "idx_in_page")
    )
    want = politeness.assign_slots_window(f, order_cols=["page", "idx_in_page"])
    got = {(r["hostname"], r["page"], r["idx_in_page"]): r["slot_ms"]
           for r in sched.collect()}
    exp = {(r["hostname"], r["page"], r["idx_in_page"]): r["slot_ms"]
           for r in want.collect()}
    assert got == exp


def test_allocate_budget_hamilton_invariants(spark):
    """Σ budget == total EXACTLY, proportionality holds, zero/negative
    weights clamp to base 0 — the pure-integer Hamilton contract that lets
    the PageRank→quota bridge replay identically on any engine."""
    w = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 1), ("d", 0), ("e", -7)],
        ["hostname", "weight"],
    )
    out = {r["hostname"]: r["budget"]
           for r in pqueue.allocate_budget(w, total=100).collect()}
    assert sum(out.values()) == 100
    # W=9: bases 55/33/11/0/0, leftover 1 goes to the largest remainder
    # (a: 500%9=5, b: 300%9=3, c: 100%9=1, d/e: 0)
    assert out == {"a": 56, "b": 33, "c": 11, "d": 0, "e": 0}


def test_allocate_budget_all_zero_weights(spark):
    """Degenerate all-zero dim: bases 0, leftover spreads in hostname
    order (no divide-by-zero under ANSI)."""
    w = spark.createDataFrame(
        [("z", 0), ("a", 0), ("m", 0)], ["hostname", "weight"]
    )
    out = {r["hostname"]: r["budget"]
           for r in pqueue.allocate_budget(w, total=2).collect()}
    assert sum(out.values()) == 2
    assert out == {"a": 1, "m": 1, "z": 0}


# -- waterfill_budget (UNIMAX capped-uniform apportionment) ------------------

def _brute_waterfill(caps: dict, total: int) -> dict:
    if not caps:
        return {}
    S = sum(caps.values())
    if S <= total:
        return dict(caps)
    t = 0
    while sum(min(c, t + 1) for c in caps.values()) <= total:
        t += 1
    out = {g: min(c, t) for g, c in caps.items()}
    r = total - sum(out.values())
    for g in sorted(g for g, c in caps.items() if c > t)[:r]:
        out[g] += 1
    return out


def _waterfill(spark, caps: dict, total: int) -> dict:
    df = spark.createDataFrame(list(caps.items()), "lang string, cap long")
    rows = pqueue.waterfill_budget(df, total).collect()
    return {r["lang"]: r["budget"] for r in rows}


def test_waterfill_hand_case(spark):
    # budget 10 over caps (en=100, fr=3, de=5): t=3 fills fr, level the
    # rest: en/de get (10-3) div 2 = 3, remainder 1 -> de first? group-asc
    # among uncapped (de, en): de gets +1? caps: de=5>3, en=100>3 -> both
    # uncapped, extras to 'de' (asc) first.
    got = _waterfill(spark, {"en": 100, "fr": 3, "de": 5}, 10)
    assert got == {"fr": 3, "de": 4, "en": 3}
    assert sum(got.values()) == 10


def test_waterfill_budget_exceeds_corpus(spark):
    caps = {"en": 4, "fr": 2}
    got = _waterfill(spark, caps, 100)
    assert got == caps  # everything fits; sum == min(total, sum(caps))


def test_waterfill_randomized_vs_brute(spark):
    import random

    rnd = random.Random(7)
    for _ in range(12):
        g = rnd.randint(1, 9)
        caps = {f"l{i}": rnd.randint(0, 40) for i in range(g)}
        total = rnd.randint(0, 250)
        assert _waterfill(spark, caps, total) == _brute_waterfill(caps, total), (
            caps,
            total,
        )


def test_waterfill_partition_invariance(spark):
    caps = {f"l{i}": (i * 13) % 29 for i in range(40)}
    df1 = spark.createDataFrame(list(caps.items()), "lang string, cap long")
    df2 = df1.repartition(17)
    a = {r["lang"]: r["budget"] for r in pqueue.waterfill_budget(df1, 137).collect()}
    b = {r["lang"]: r["budget"] for r in pqueue.waterfill_budget(df2, 137).collect()}
    assert a == b == _brute_waterfill(caps, 137)


def test_waterfill_negative_caps_clamp(spark):
    got = _waterfill(spark, {"a": -5, "b": 10}, 7)
    assert got == {"a": 0, "b": 7}
