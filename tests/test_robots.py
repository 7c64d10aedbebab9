"""RFC 9309 robots.txt parsing + gating (operators/robots.py).

Vectors follow RFC 9309 §2.2 / §5 examples and the classic precedence
cases: group selection (specific beats ``*``, merge of same-selection
groups), longest-match-wins, allow-on-tie, ``*`` wildcard, ``$`` anchor,
empty patterns, comments/case/whitespace tolerance, crawl-delay extraction
and the greatest(consent, delay) merge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from starchart_spark.operators import robots as R

UA = "starchart"


def _gate(spark, bodies, urls, agent=UA):
    """bodies: [(host, txt)], urls: [(host, path)] → {(host, path): allowed}"""
    robots_df = spark.createDataFrame(bodies, ["hostname", "robots_txt"])
    dim = R.rules_dim(R.compile_rules(R.parse_robots(robots_df, agent)))
    frontier = spark.createDataFrame(urls, ["hostname", "path"])
    rows = R.robots_gate(frontier, dim).collect()
    return {(r["hostname"], r["path"]): r["robots_allowed"] for r in rows}


def test_group_selection_specific_beats_wildcard(spark):
    body = (
        "User-agent: starchart\nDisallow: /only-me/\n\n"
        "User-agent: *\nDisallow: /everyone/\n"
    )
    got = _gate(
        spark,
        [("h", body)],
        [("h", "/only-me/x"), ("h", "/everyone/x")],
    )
    # a specific group exists => the * group does NOT apply to us
    assert got[("h", "/only-me/x")] is False
    assert got[("h", "/everyone/x")] is True


def test_wildcard_group_applies_when_no_specific(spark):
    body = "User-agent: other\nDisallow: /\n\nUser-agent: *\nDisallow: /w/\n"
    got = _gate(spark, [("h", body)], [("h", "/w/x"), ("h", "/ok")])
    assert got[("h", "/w/x")] is False
    assert got[("h", "/ok")] is True


def test_same_agent_groups_merge(spark):
    body = (
        "User-agent: starchart\nDisallow: /a/\n\n"
        "User-agent: starchart\nDisallow: /b/\n"
    )
    got = _gate(spark, [("h", body)], [("h", "/a/1"), ("h", "/b/1"), ("h", "/c")])
    assert got[("h", "/a/1")] is False
    assert got[("h", "/b/1")] is False
    assert got[("h", "/c")] is True


def test_consecutive_ua_lines_share_one_group(spark):
    body = "User-agent: other\nUser-agent: starchart\nDisallow: /x/\n"
    got = _gate(spark, [("h", body)], [("h", "/x/1")])
    assert got[("h", "/x/1")] is False


def test_longest_match_wins_and_tie_prefers_allow(spark):
    body = (
        "User-agent: *\n"
        "Disallow: /p/\n"
        "Allow: /p/public/\n"  # longer => wins inside /p/public/
        "Allow: /tie\n"
        "Disallow: /tie\n"  # same length => allow wins (RFC least-restrictive)
    )
    got = _gate(
        spark,
        [("h", body)],
        [("h", "/p/secret"), ("h", "/p/public/x"), ("h", "/tie/x")],
    )
    assert got[("h", "/p/secret")] is False
    assert got[("h", "/p/public/x")] is True
    assert got[("h", "/tie/x")] is True


def test_wildcard_and_dollar_anchor(spark):
    body = (
        "User-agent: *\n"
        "Disallow: /*.json$\n"
        "Disallow: /tmp*/\n"
    )
    got = _gate(
        spark,
        [("h", body)],
        [
            ("h", "/a/b.json"),
            ("h", "/a/b.json?x=1"),  # $ anchor: query suffix => no match
            ("h", "/tmp123/f"),
            ("h", "/tmpfile"),  # no trailing slash segment => no match
        ],
    )
    assert got[("h", "/a/b.json")] is False
    assert got[("h", "/a/b.json?x=1")] is True
    assert got[("h", "/tmp123/f")] is False
    assert got[("h", "/tmpfile")] is True


def test_regex_metachars_in_patterns_are_literal(spark):
    body = "User-agent: *\nDisallow: /a+b(c)/\n"
    got = _gate(spark, [("h", body)], [("h", "/a+b(c)/x"), ("h", "/aab/x")])
    assert got[("h", "/a+b(c)/x")] is False
    assert got[("h", "/aab/x")] is True


def test_empty_patterns_comments_case_whitespace(spark):
    body = (
        "# robots for h\n"
        "USER-AGENT: STARCHART  # inline comment\n"
        "  DisAllow :\n"  # empty pattern: matches nothing
        "\tdisallow:   /d/  \n"
        "unknown-directive: zzz\n"
    )
    got = _gate(spark, [("h", body)], [("h", "/d/x"), ("h", "/free")])
    assert got[("h", "/d/x")] is False
    assert got[("h", "/free")] is True


def test_rules_before_any_group_are_ignored(spark):
    body = "Disallow: /orphan/\nUser-agent: *\nDisallow: /g/\n"
    got = _gate(spark, [("h", body)], [("h", "/orphan/x"), ("h", "/g/x")])
    assert got[("h", "/orphan/x")] is True
    assert got[("h", "/g/x")] is False


def test_no_robots_and_no_match_allow(spark):
    body = "User-agent: *\nDisallow: /only/\n"
    got = _gate(
        spark,
        [("h", body)],
        [("h", "/elsewhere"), ("nohost", "/anything")],
    )
    assert got[("h", "/elsewhere")] is True
    assert got[("nohost", "/anything")] is True


def test_disallow_all(spark):
    body = "User-agent: *\nDisallow: /\n"
    got = _gate(spark, [("h", body)], [("h", "/"), ("h", "/any/path")])
    assert got[("h", "/")] is False
    assert got[("h", "/any/path")] is False


def test_crawl_delay_parse_and_merge(spark):
    bodies = spark.createDataFrame(
        [
            ("h1", "User-agent: *\nCrawl-delay: 2.5\nCrawl-delay: 1\n"),
            ("h2", "User-agent: *\nCrawl-delay: nope\n"),
            ("h3", "User-agent: other\nCrawl-delay: 9\n\nUser-agent: *\nDisallow: /x\n"),
        ],
        ["hostname", "robots_txt"],
    )
    delays = R.parse_crawl_delay(bodies, UA)
    got = {r["hostname"]: r["crawl_delay_ms"] for r in delays.collect()}
    # max of repeated values; non-numeric ignored; other-agent group ignored
    assert got == {"h1": 2500}

    consented = spark.createDataFrame(
        [("h1", 2000), ("h2", 2000), ("h4", 500)],
        ["hostname", "effective_rate_ms"],
    )
    merged = R.merge_crawl_delay(consented, delays)
    rates = {r["hostname"]: r["effective_rate_ms"] for r in merged.collect()}
    assert rates == {"h1": 2500, "h2": 2000, "h4": 500}


def test_gate_plan_is_broadcast_no_shuffle(spark):
    """The gate must add zero exchanges on the frontier side: broadcast
    join + projection only."""
    robots_df = spark.createDataFrame(
        [("h0", "User-agent: *\nDisallow: /d/\n"), ("h1", "User-agent: *\nAllow: /\n")],
        ["hostname", "robots_txt"],
    )
    dim = R.rules_dim(R.compile_rules(R.parse_robots(robots_df, UA))).cache()
    dim.count()  # materialize the dim so its own build exchanges don't count
    frontier = (
        spark.range(0, 1000)
        .select(
            F.concat(F.lit("h"), F.col("id") % 2).alias("hostname"),
            F.concat(F.lit("/p/"), F.col("id")).alias("path"),
        )
    )
    gated = R.robots_gate(frontier, dim)
    gated.collect()  # resolve AQE so the final physical plan is inspectable
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the cached dim's InMemoryRelation embeds its own (dim-scale) build
    # plan text, whose parse windows legitimately shuffle — the frontier
    # side of the executed plan must not
    frontier_side = plan.split("InMemoryRelation")[0]
    assert "Exchange hashpartitioning" not in frontier_side


def test_sitemap_refs_global_case_dupes(spark):
    """Sitemap records are global (before/inside/after groups), field is
    case-insensitive, the URL value keeps case, duplicates collapse, and a
    host with no Sitemap lines is absent."""
    bodies = [
        ("h0", "Sitemap: https://h0.test/a.xml\nUser-agent: *\nDisallow: /\n"),
        (
            "h1",
            "User-agent: *\nDisallow: /x\n"
            "SITEMAP: https://h1.test/B.xml\n"
            "\tsitemap: https://h1.test/c.xml  # comment\n"
            "sitemap: https://h1.test/c.xml\n",
        ),
        ("h2", "User-agent: *\nDisallow: /\n"),
        ("h3", "Sitemap:\n"),  # empty value dropped
    ]
    df = spark.createDataFrame(bodies, ["hostname", "robots_txt"])
    got = sorted(
        (r["hostname"], r["sitemap_url"])
        for r in R.parse_sitemap_refs(df).collect()
    )
    assert got == [
        ("h0", "https://h0.test/a.xml"),
        ("h1", "https://h1.test/B.xml"),
        ("h1", "https://h1.test/c.xml"),
    ]


def test_refresh_policy_status_semantics(spark):
    """2xx rules / 4xx fail-OPEN / 5xx+unreachable fail-CLOSED with the
    cached-rules grace; 24h cache window drives use_cached vs refetch."""
    now = 100_000
    rows = [
        # host, status, fetched_s, has_rules
        ("ok-fresh", 200, now - 100, True),
        ("ok-stale", 200, now - 90_000, True),
        ("gone", 404, now - 100, False),
        ("forbidden", 403, now - 100, False),
        ("err-no-cache", 503, now - 100, False),
        ("err-cached", 500, now - 90_000, True),
        ("unreachable", None, now - 100, False),
        ("unreachable-cached", 0, now - 100, True),
    ]
    df = spark.createDataFrame(
        rows, "hostname string, status int, fetched_s long, has_rules boolean"
    )
    got = {
        r["hostname"]: (r["decision"], r["access"])
        for r in R.refresh_policy(df, now_s=now).collect()
    }
    assert got["ok-fresh"] == ("use_cached", "rules")
    assert got["ok-stale"] == ("refetch", "rules")  # 90,000 s > the 24 h window
    assert got["gone"] == ("use_cached", "allow_all")
    assert got["forbidden"] == ("use_cached", "allow_all")
    assert got["err-no-cache"] == ("use_cached", "deny_all")
    assert got["err-cached"] == ("refetch", "rules")
    assert got["unreachable"] == ("refetch", "deny_all")
    assert got["unreachable-cached"] == ("refetch", "rules")
