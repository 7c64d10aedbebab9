"""Exact quantiles (operators/stats.py) and BFS hop distance
(graph.hop_distance): brute-force parity, tie/edge semantics, and
partition-invariance (both are exact-integer contracts)."""

import pytest
from pyspark.sql import functions as F

from starchart_spark.operators import graph, stats

QS = [0, 100, 250, 500, 750, 900, 1000]


def _brute_quantiles(values, qs):
    s = sorted(values)
    n = len(s)
    return {q: (1 + (q * (n - 1)) // 1000, s[(q * (n - 1)) // 1000]) for q in qs}


# --------------------------------------------------------------------- stats


def test_exact_quantiles_brute_parity(spark):
    # deterministic pseudo-random values incl. heavy ties
    vals = [(i * 7919) % 113 for i in range(501)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    out = {
        r["q_milli"]: (r["qrank"], r["value"])
        for r in stats.exact_quantiles(df, "x", QS).collect()
    }
    assert out == _brute_quantiles(vals, QS)


def test_exact_quantiles_partition_invariance(spark):
    vals = [(i * 31) % 47 for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    a = sorted(stats.exact_quantiles(df, "x", QS).collect())
    b = sorted(stats.exact_quantiles(df.repartition(7), "x", QS).collect())
    assert a == b


def test_exact_quantiles_edges(spark):
    # n=1: every quantile is the single value at rank 1
    one = spark.createDataFrame([(42,)], ["x"])
    rows = stats.exact_quantiles(one, "x", [0, 500, 1000]).collect()
    assert {(r["q_milli"], r["qrank"], r["value"]) for r in rows} == {
        (0, 1, 42),
        (500, 1, 42),
        (1000, 1, 42),
    }
    # q=0 is the min, q=1000 the max, exactly
    vals = list(range(10, 110))
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    out = {
        r["q_milli"]: r["value"]
        for r in stats.exact_quantiles(df, "x", [0, 1000]).collect()
    }
    assert out == {0: 10, 1000: 109}


def test_exact_quantiles_validation(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(ValueError):
        stats.exact_quantiles(df, "x", [])
    with pytest.raises(ValueError):
        stats.exact_quantiles(df, "x", [1001])
    with pytest.raises(ValueError):
        stats.exact_quantiles(df, "x", [500, 500])


def test_group_quantiles_brute_parity(spark):
    rows = [("g%d" % (i % 3), (i * 97) % 59) for i in range(300)]
    df = spark.createDataFrame(rows, ["g", "x"])
    got = {
        (r["grp"], r["q_milli"]): (r["qrank"], r["value"])
        for r in stats.group_quantiles(df, "g", "x", QS).collect()
    }
    want = {}
    for g in {"g0", "g1", "g2"}:
        per = _brute_quantiles([x for gg, x in rows if gg == g], QS)
        for q, rv in per.items():
            want[(g, q)] = rv
    assert got == want


def test_group_quantiles_skewed_group(spark):
    # one group holds 95% of rows (the mega-group the two-pass ranker
    # exists for); result must equal the brute computation regardless
    rows = [("big", (i * 13) % 257) for i in range(950)] + [
        ("small", i) for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["g", "x"]).repartition(11)
    got = {
        (r["grp"], r["q_milli"]): (r["qrank"], r["value"])
        for r in stats.group_quantiles(df, "g", "x", [250, 500, 750]).collect()
    }
    for g in ("big", "small"):
        per = _brute_quantiles([x for gg, x in rows if gg == g], [250, 500, 750])
        for q, rv in per.items():
            assert got[(g, q)] == rv


# ------------------------------------------------------------------- BFS


def _hops(df):
    return {r["host"]: r["hops"] for r in df.collect()}


def test_hop_distance_chain(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("a",)], ["host"])
    assert _hops(graph.hop_distance(edges, seeds, max_hops=3)) == {
        "a": 0,
        "b": 1,
        "c": 2,
        "d": 3,  # exact on the <=k ball ...
    }  # ... and e (distance 4) is absent, not misreported


def test_hop_distance_min_over_seeds_and_cycle(spark):
    # two seeds, a cycle, and a host reachable from both at different
    # depths: min wins; the cycle must not inflate distances
    edges = spark.createDataFrame(
        [("s1", "x"), ("x", "y"), ("y", "x"), ("s2", "y"), ("y", "z")],
        ["src", "dst"],
    )
    seeds = spark.createDataFrame([("s1",), ("s2",)], ["host"])
    assert _hops(graph.hop_distance(edges, seeds, max_hops=4)) == {
        "s1": 0,
        "s2": 0,
        "x": 1,
        "y": 1,  # via s2, not 2 via s1
        "z": 2,
    }


def test_hop_distance_isolated_seed_and_invariance(spark):
    edges = spark.range(400).select(
        F.concat(F.lit("h"), (F.col("id") % 29).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((F.col("id") * 11) % 31).cast("string")).alias("dst"),
    ).distinct()
    # "offgraph" has no edges: it must still report hops 0
    seeds = spark.createDataFrame([("h1",), ("offgraph",)], ["host"])
    a = _hops(graph.hop_distance(edges, seeds, max_hops=4))
    assert a["offgraph"] == 0
    b = _hops(graph.hop_distance(edges.repartition(13), seeds, max_hops=4))
    assert a == b
