"""Sitemap-protocol ingestion: tolerant parse, entities, index refs, oracle."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from starchart_spark.operators import sitemaps

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> http://ex.com/a?x=1&amp;y=2 </loc>
    <lastmod>2024-01-05T10:30:00+00:00</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>http://ex.com/b</loc><changefreq>sometimes</changefreq></url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc>http://ex.com/&amp;lt;odd&amp;gt;</loc><priority>1</priority></url>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>http://ex.com/sitemap-1.xml</loc><lastmod>2023-12-31</lastmod></sitemap>
  <sitemap><loc>http://ex.com/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""


def _parse(spark, rows):
    df = spark.createDataFrame(rows, ["hostname", "body"])
    return sitemaps.parse_sitemaps(df).collect()


def test_urlset_fields(spark):
    rows = {r["loc"]: r for r in _parse(spark, [("ex.com", URLSET)])}
    a = rows["http://ex.com/a?x=1&y=2"]  # entity unescaped, loc trimmed
    assert a["kind"] == "url"
    assert a["lastmod_days"] == 19727  # 2024-01-05, date prefix of W3C stamp
    assert a["changefreq"] == "daily"
    assert a["priority_1000"] == 800
    b = rows["http://ex.com/b"]
    assert b["changefreq"] is None  # 'sometimes' is not spec vocabulary
    assert b["priority_1000"] == 500  # spec default 0.5
    # double-escaped entities stay literal (&amp; is unescaped LAST)
    assert "http://ex.com/&lt;odd&gt;" in rows
    assert rows["http://ex.com/&lt;odd&gt;"]["priority_1000"] == 1000
    # the loc-less entry dropped
    assert len(rows) == 3


def test_sitemapindex_refs(spark):
    got = sorted(
        (r["kind"], r["loc"], r["lastmod_days"], r["priority_1000"])
        for r in _parse(spark, [("ex.com", INDEX)])
    )
    assert got == [
        ("sitemap", "http://ex.com/sitemap-1.xml", 19722, None),
        ("sitemap", "http://ex.com/sitemap-2.xml", None, None),
    ]


def test_frontier_candidates_dedup(spark):
    # same loc twice with different hints → one row, strongest of each
    body = (
        "<urlset><url><loc>http://h/p</loc><priority>0.2</priority>"
        "<lastmod>2024-01-01</lastmod></url>"
        "<url><loc>http://h/p</loc><priority>0.9</priority></url></urlset>"
    )
    df = spark.createDataFrame([("h", body)], ["hostname", "body"])
    out = sitemaps.frontier_candidates(sitemaps.parse_sitemaps(df)).collect()
    assert len(out) == 1
    assert out[0]["priority_1000"] == 900
    assert out[0]["lastmod_days"] == 19723


def test_sql_oracle_parity(spark):
    rows = [("ex.com", URLSET), ("idx.com", INDEX), ("empty.com", "<urlset></urlset>")]
    got = sorted(tuple(r) for r in _parse(spark, rows))
    vals = ", ".join(
        "('%s', '%s')" % (h, b.replace("'", "''")) for h, b in rows
    )
    sql = sitemaps.parse_sitemaps_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(hostname, body)"
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want


def test_recrawl_delta_statuses(spark):
    """new / updated / unchanged / no-lastmod-is-unchanged semantics."""
    from starchart_spark.operators import sitemaps as sm

    entries = spark.createDataFrame(
        [
            ("h", "u/new", 100),
            ("h", "u/updated", 100),
            ("h", "u/same-day", 100),
            ("h", "u/older", 100),
            ("h", "u/no-hint", None),
        ],
        "hostname string, loc string, lastmod_days int",
    )
    ledger = spark.createDataFrame(
        [
            ("u/updated", 99),
            ("u/same-day", 100),
            ("u/older", 150),
            ("u/no-hint", 1),
        ],
        "loc string, fetched_day int",
    )
    got = {
        r["loc"]: (r["status"], r["fetched_day"])
        for r in sm.recrawl_delta(entries, ledger).collect()
    }
    assert got["u/new"] == ("new", None)
    assert got["u/updated"] == ("updated", 99)
    assert got["u/same-day"] == ("unchanged", 100)
    assert got["u/older"] == ("unchanged", 150)
    # no lastmod: absence proves nothing, even with an ancient fetch
    assert got["u/no-hint"] == ("unchanged", 1)
