"""Adaptive re-crawl scheduling: hand-checked TTL arithmetic, clamping,
monotonicity in the change rate, and the due-host predicate."""

from starchart_spark.operators import recrawl

BASE, MIN, MAX = 1000, 100, 10_000


def _sched(spark, rows):
    df = spark.createDataFrame(rows, "hostname string, ts long, changed boolean")
    return {
        r["hostname"]: r
        for r in recrawl.recrawl_schedule(df, BASE, MIN, MAX).collect()
    }


def test_hand_computed_ttl(spark):
    rows = [
        # h1: 4 visits, 1 change → ttl = 1000*4 div 2 = 2000
        ("h1", 10, False), ("h1", 20, True), ("h1", 30, False), ("h1", 40, False),
        # h2: 2 visits, 2 changes → 1000*2 div 3 = 666
        ("h2", 5, True), ("h2", 15, True),
    ]
    s = _sched(spark, rows)
    assert s["h1"]["ttl"] == 2000 and s["h1"]["next_due"] == 2040
    assert s["h2"]["ttl"] == 666 and s["h2"]["next_due"] == 681
    assert s["h1"]["n_visits"] == 4 and s["h1"]["n_changes"] == 1


def test_clamping(spark):
    rows = [
        # never changes, many visits → raw 20·1000 = 20000, clamped to MAX
        *[("stale", t, False) for t in range(20)],
        # always changes → raw 1000*2 div 3 = 666... use 1 visit 1 change:
        # raw 1000 div 2 = 500 > MIN; to hit MIN: 1 visit, 9 changes is
        # impossible (changes ≤ visits) — so craft 1 visit 1 change with a
        # big MIN via direct check below instead
        ("hot", 7, True),
    ]
    s = _sched(spark, rows)
    assert s["stale"]["ttl"] == MAX
    assert s["hot"]["ttl"] == max(BASE * 1 // 2, MIN)


def test_more_changes_sooner(spark):
    rows = []
    for i, ch in enumerate([0, 1, 2, 3]):
        h = f"h{ch}"
        for v in range(4):
            rows.append((h, 100 + v, v < ch))
    s = _sched(spark, rows)
    ttls = [s[f"h{c}"]["ttl"] for c in range(4)]
    assert ttls == sorted(ttls, reverse=True)  # more changes ⇒ shorter ttl


def test_due_hosts(spark):
    rows = [("a", 0, False), ("b", 0, True), ("b", 5000, True)]
    df = spark.createDataFrame(rows, "hostname string, ts long, changed boolean")
    sched = recrawl.recrawl_schedule(df, BASE, MIN, MAX)
    # a: next_due = 0 + min(1000,MAX) = 1000; b: 5000 + 2000 div 3 = 5666
    assert {r["hostname"] for r in recrawl.due_hosts(sched, 1000).collect()} == {"a"}
    assert {r["hostname"] for r in recrawl.due_hosts(sched, 6000).collect()} == {"a", "b"}


def test_partition_invariance(spark):
    rows = [(f"h{i % 9}", i * 13, i % 4 == 0) for i in range(400)]
    df = spark.createDataFrame(rows, "hostname string, ts long, changed boolean")
    a = sorted(map(tuple, recrawl.recrawl_schedule(df, BASE, MIN, MAX).collect()))
    b = sorted(
        map(
            tuple,
            recrawl.recrawl_schedule(df.repartition(17), BASE, MIN, MAX).collect(),
        )
    )
    assert a == b


def test_failure_backoff_hand_case(spark):
    from starchart_spark.operators import recrawl

    rows = [
        ("a", 10, True), ("a", 20, False), ("a", 30, False),
        ("b", 50, True),
        ("c", 5, False),
    ]
    df = spark.createDataFrame(rows, ["hostname", "ts", "ok"])
    got = {
        r["hostname"]: (r["fails_since_ok"], r["last_ts"], r["next_attempt"])
        for r in recrawl.failure_backoff(df, base_ms=100).collect()
    }
    assert got == {
        "a": (2, 30, 30 + 100 * 4),   # two trailing failures → 2^2
        "b": (0, 50, 50 + 100),       # healthy → one base interval
        "c": (1, 5, 5 + 100 * 2),     # never succeeded → 2^1
    }


def test_failure_backoff_cap_and_recovery(spark):
    from starchart_spark.operators import recrawl

    rows = [("h", t, False) for t in range(12)]  # 12 straight failures
    df = spark.createDataFrame(rows, ["hostname", "ts", "ok"])
    r = recrawl.failure_backoff(df, base_ms=10, cap=10).collect()[0]
    assert r["fails_since_ok"] == 12
    assert r["next_attempt"] == 11 + 10 * (1 << 10)  # capped at 2^10
    # a success resets the trailing count
    df2 = df.union(spark.createDataFrame([("h", 20, True)], df.schema))
    r2 = recrawl.failure_backoff(df2, base_ms=10, cap=10).collect()[0]
    assert r2["fails_since_ok"] == 0 and r2["next_attempt"] == 30


def test_revisit_plan_precedence(spark):
    """One URL per branch, incl. the sitemap-overrides-defer edge and the
    first-sighting (host absent from schedule) path."""
    from starchart_spark.operators import recrawl

    NOW = 1_000
    resp = spark.createDataFrame(
        [
            # fresh cache (max-age outlives age), host due -> skip
            ("h1", "u/skip", None, None, "max-age=900", 500),
            # fresh cache BUT host deferred -> defer wins over skip
            ("h2", "u/defer", None, None, "max-age=900", 500),
            # stale with validator, host due -> revalidate
            ("h1", "u/reval", '"e1"', None, "max-age=10", 500),
            # stale, no validator, host due -> fetch
            ("h1", "u/fetch", None, None, None, 500),
            # fresh cache AND deferred host BUT sitemap says updated -> fetch
            ("h2", "u/smwin", None, None, "max-age=900", 500),
            # host absent from schedule (first sighting) -> treated due
            ("h9", "u/new-host", None, None, "max-age=900", 500),
        ],
        "hostname string, url string, etag string, last_modified_s long,"
        " cache_control string, fetched_s long",
    )
    sitemap = spark.createDataFrame(
        [("u/smwin", "updated"), ("u/skip", "unchanged")],
        "url string, status string",
    )
    schedule = spark.createDataFrame(
        [("h1", 900), ("h2", 2_000)], "hostname string, next_due long"
    )
    out = {
        r["url"]: (r["action"], r["next_check_s"], r["sitemap_status"])
        for r in recrawl.revisit_plan(
            resp, sitemap, schedule, now_s=NOW
        ).collect()
    }
    assert out["u/skip"] == ("skip", 500 + 900, "unchanged")
    assert out["u/defer"] == ("defer", 2_000, "none")
    assert out["u/reval"][0] == "revalidate"
    assert out["u/reval"][1] == NOW
    assert out["u/fetch"][0] == "fetch"
    assert out["u/smwin"] == ("fetch", NOW, "updated")
    assert out["u/new-host"][0] == "skip"  # due (absent) + fresh cache
