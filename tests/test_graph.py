"""Host PageRank: hand-checkable structure, exact-integer determinism
across partitionings, dangling-mass handling, and the scheduler handoff."""

from pyspark.sql import functions as F

from starchart_spark.operators import graph


def _ranks(df):
    return {r["host"]: r["rank_u"] for r in df.collect()}


def test_star_graph_hub_wins(spark):
    # leaves l1..l4 all link to hub; hub links back to l1 only
    edges = spark.createDataFrame(
        [("l1", "hub"), ("l2", "hub"), ("l3", "hub"), ("l4", "hub"), ("hub", "l1")],
        ["src", "dst"],
    )
    # the hub↔l1 cycle oscillates with period 2 and decays by the damping
    # factor per round — 30 rounds leave amplitude ~0.85^30 ≈ 0.8% of mass,
    # well inside the steady-state hub−l1 gap (~4% of mass)
    r = _ranks(graph.pagerank(edges, iters=30))
    assert set(r) == {"hub", "l1", "l2", "l3", "l4"}
    assert r["hub"] > r["l1"] > r["l2"]  # l1 gets the hub's mass back
    assert r["l2"] == r["l3"] == r["l4"]  # symmetric leaves tie exactly


def test_partition_invariance_exact(spark):
    # integer arithmetic: bit-identical ranks under any repartitioning
    edges = spark.range(300).select(
        F.concat(F.lit("h"), (F.col("id") % 17).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((F.col("id") * 7) % 23).cast("string")).alias("dst"),
    ).distinct()
    a = _ranks(graph.pagerank(edges, iters=5))
    b = _ranks(graph.pagerank(edges.repartition(13), iters=5))
    assert a == b


def test_dangling_mass_redistributed(spark):
    # "sink" has no out-edges: its mass must flow back uniformly, not vanish
    edges = spark.createDataFrame(
        [("a", "sink"), ("b", "sink"), ("a", "b"), ("b", "a")], ["src", "dst"]
    )
    r = _ranks(graph.pagerank(edges, iters=10))
    total = sum(r.values())
    # floors leak a few units/node/round; mass must stay ~SCALE, not decay
    # toward the dangling-free fraction
    assert total > graph.SCALE * 0.98
    assert r["sink"] > r["a"]  # two in-edges beat one


def test_self_loop_direction(spark):
    edges = spark.createDataFrame(
        [("x", "x"), ("x", "y"), ("y", "x")], ["src", "dst"]
    )
    r = _ranks(graph.pagerank(edges, iters=30))
    # x keeps half its own mass AND receives all of y's; y only gets half
    # of x's: steady state has x − y = d·y > 0
    assert set(r) == {"x", "y"}
    assert r["x"] > r["y"]


def test_rank_feeds_priority_queue(spark):
    """The intended composition: pagerank output joins the frontier as the
    pqueue priority column (host-level dim join, broadcastable)."""
    from starchart_spark.operators import pqueue

    edges = spark.createDataFrame(
        [("h1", "h2"), ("h3", "h2"), ("h2", "h1")], ["src", "dst"]
    )
    ranks = graph.pagerank(edges, iters=5)
    frontier = spark.createDataFrame(
        [(i, f"h{1 + i % 3}", 250) for i in range(30)],
        ["doc_id", "hostname", "effective_rate_ms"],
    ).withColumn("effective_rate_ms", F.col("effective_rate_ms").cast("long"))
    prioritized = frontier.join(
        F.broadcast(ranks.withColumnRenamed("host", "hostname")), "hostname"
    ).withColumn("priority", F.col("rank_u").cast("double"))
    scheduled, deferred = pqueue.pq_schedule(frontier=prioritized, budget_ms=1000)
    assert scheduled.count() + deferred.count() == 30
    # within a host, ranks are dense 1..n by (priority desc, doc_id)
    per_host = (
        scheduled.groupBy("hostname")
        .agg(F.max(pqueue.RANK_COL).alias("mx"), F.count("*").alias("n"))
        .collect()
    )
    for row in per_host:
        assert row["mx"] == row["n"]


# --------------------------------------------------------------------------
# HITS hubs/authorities


def _hits(df):
    return {r["host"]: (r["hub_u"], r["auth_u"]) for r in df.collect()}


def test_hits_pure_hub_and_authorities(spark):
    # a links to b, c, d and receives nothing: a is the pure hub, the
    # leaves are pure (and symmetric) authorities — exact fixed point
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d")], ["src", "dst"]
    )
    h = _hits(graph.hits(edges, iters=3))
    S = graph.HITS_SCALE
    assert h["a"] == (S, 0)
    assert h["b"] == h["c"] == h["d"] == (0, S)


def test_hits_in_degree_dominance(spark):
    # m has three hub in-links, n has one (from the same hubs): m's
    # authority must dominate; the shared hubs out-score the single-link one
    edges = spark.createDataFrame(
        [("h1", "m"), ("h2", "m"), ("h3", "m"), ("h1", "n")], ["src", "dst"]
    )
    h = _hits(graph.hits(edges, iters=4))
    assert h["m"][1] == graph.HITS_SCALE  # top authority pegs at scale
    assert h["m"][1] > h["n"][1] > 0
    assert h["h1"][0] > h["h2"][0]  # h1 points at BOTH authorities
    assert h["h2"][0] == h["h3"][0]  # symmetric hubs tie exactly


def test_hits_partition_invariance_exact(spark):
    edges = spark.range(300).select(
        F.concat(F.lit("h"), (F.col("id") % 17).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((F.col("id") * 7) % 23).cast("string")).alias("dst"),
    ).distinct()
    a = _hits(graph.hits(edges, iters=3))
    b = _hits(graph.hits(edges.repartition(13), iters=3))
    assert a == b


def test_hits_sql_oracle_parity(spark):
    """The unrolled DuckDB oracle reproduces the Spark iteration exactly —
    the same guarantee pagerank_sql gives, checked here on a graph with
    dangling hosts and asymmetric degrees."""
    import duckdb

    rows = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "b"), ("e", "a"),
    ]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    got = _hits(graph.hits(edges, iters=4))
    vals = ", ".join(f"('{s}', '{d}')" for s, d in rows)
    sql = graph.hits_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", iters=4
    )
    want = {
        r[0]: (r[1], r[2]) for r in duckdb.sql(sql).fetchall()
    }
    assert got == want


# --------------------------------------------------------------------------
# TrustRank


def test_trustrank_unreachable_is_hard_zero(spark):
    """Trust flows only along paths FROM seeds: the d→e island has no
    inlink from the trusted side, so both score EXACTLY 0 (integer
    arithmetic — the demotion signal is a hard zero, not an epsilon)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("a",)], ["host"])
    t = {r["host"]: r["trust_u"] for r in graph.trustrank(edges, seeds).collect()}
    assert t["d"] == 0 and t["e"] == 0
    assert t["a"] > 0 and t["b"] > 0 and t["c"] > 0


def test_trustrank_all_seeds_is_pagerank(spark):
    """seeds = every host ⇒ the recurrence degenerates to PageRank —
    asserted bit-for-bit, which pins the shared integer program."""
    edges = spark.range(200).select(
        F.concat(F.lit("h"), (F.col("id") % 13).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((F.col("id") * 5) % 19).cast("string")).alias("dst"),
    ).distinct()
    all_hosts = edges.select(F.col("src").alias("host")).union(
        edges.select(F.col("dst").alias("host"))
    ).distinct()
    pr = {r["host"]: r["rank_u"] for r in graph.pagerank(edges, iters=4).collect()}
    tr = {
        r["host"]: r["trust_u"]
        for r in graph.trustrank(edges, all_hosts, iters=4).collect()
    }
    assert pr == tr


def test_trustrank_empty_seed_raises(spark):
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    seeds = spark.createDataFrame([("zzz",)], ["host"])  # not in graph
    import pytest as _pytest

    with _pytest.raises(ValueError):
        graph.trustrank(edges, seeds)


def test_trustrank_sql_oracle_parity(spark):
    import duckdb

    rows = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "b"), ("e", "a"), ("f", "g"),
    ]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    seeds = spark.createDataFrame([("a",), ("d",), ("zz",)], ["host"])
    got = {
        r["host"]: r["trust_u"]
        for r in graph.trustrank(edges, seeds, iters=4).collect()
    }
    vals = ", ".join(f"('{s}', '{d}')" for s, d in rows)
    sql = graph.trustrank_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)",
        "SELECT * FROM (VALUES ('a'), ('d'), ('zz')) AS s(host)",
        iters=4,
    )
    want = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
    assert got == want
    assert got["f"] == 0 and got["g"] == 0  # island beyond the seeds


# --------------------------------------------------------------------------
# OPIC


def _opic_ref(rows, iters, scale=graph.OPIC_SCALE):
    """Python reference of the synchronous cash/history recurrence."""
    nodes = sorted({s for s, _ in rows} | {d for _, d in rows})
    out = {}
    for s, d in rows:
        out.setdefault(s, []).append(d)
    n = len(nodes)
    cash = {h: scale // n for h in nodes}
    hist = {h: 0 for h in nodes}
    for _ in range(iters):
        inc = {h: 0 for h in nodes}
        dang = 0
        for h in nodes:
            if h in out:
                share = cash[h] // len(out[h])
                for d in out[h]:
                    inc[d] += share
            else:
                dang += cash[h]
        for h in nodes:
            hist[h] += cash[h]
        for h in nodes:
            cash[h] = inc[h] + dang // n
    return {h: (cash[h], hist[h], cash[h] + hist[h]) for h in nodes}


OPIC_ROWS = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"), ("d", "b"), ("e", "a"),
]


def test_opic_matches_reference(spark):
    edges = spark.createDataFrame(OPIC_ROWS, ["src", "dst"])
    got = {
        r["host"]: (r["cash_u"], r["hist_u"], r["score_u"])
        for r in graph.opic(edges, iters=4).collect()
    }
    assert got == _opic_ref(OPIC_ROWS, iters=4)


def test_opic_sql_oracle_parity(spark):
    import duckdb

    edges = spark.createDataFrame(OPIC_ROWS, ["src", "dst"])
    got = {
        r["host"]: (r["cash_u"], r["hist_u"], r["score_u"])
        for r in graph.opic(edges, iters=4).collect()
    }
    vals = ", ".join(f"('{s}', '{d}')" for s, d in OPIC_ROWS)
    sql = graph.opic_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", iters=4
    )
    want = {r[0]: (r[1], r[2], r[3]) for r in duckdb.sql(sql).fetchall()}
    assert got == want


def test_opic_authority_ordering(spark):
    """c receives from three pages (a, b, d) — its online importance must
    beat the pure-source pages d and e, which only ever hold their initial
    grant plus redistributed dangling crumbs."""
    edges = spark.createDataFrame(OPIC_ROWS, ["src", "dst"])
    scores = {r["host"]: r["score_u"] for r in graph.opic(edges, iters=6).collect()}
    assert scores["c"] > scores["d"]
    assert scores["c"] > scores["e"]


def test_opic_partition_invariance(spark):
    edges = spark.createDataFrame(OPIC_ROWS, ["src", "dst"])
    a = {
        r["host"]: r["score_u"]
        for r in graph.opic(edges.repartition(7), iters=3).collect()
    }
    b = {
        r["host"]: r["score_u"]
        for r in graph.opic(edges.coalesce(1), iters=3).collect()
    }
    assert a == b
