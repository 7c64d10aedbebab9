"""Registrable-domain (eTLD+1) extraction — PSL-algorithm parity.

Test vectors follow the published checkPublicSuffix cases on
publicsuffix.org/list (the spec's own examples for normal, multi-label,
wildcard and exception rules), run against a small in-test rule dim.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from starchart_spark.operators import domains

RULES = [
    "com",
    "co.uk",
    "uk",
    "jp",
    "ac.jp",
    "*.ck",
    "!www.ck",
    "blogspot.com",
    "// comment line",
    "",
]

CASES = [
    # (host, public_suffix, site)
    ("example.com", "com", "example.com"),
    ("www.example.com", "com", "example.com"),
    ("com", "com", None),
    ("example.co.uk", "co.uk", "example.co.uk"),
    ("api.example.co.uk", "co.uk", "example.co.uk"),
    ("co.uk", "co.uk", None),
    ("keio.ac.jp", "ac.jp", "keio.ac.jp"),
    # wildcard: any 2-label .ck suffix is public
    ("foo.org.ck", "org.ck", "foo.org.ck"),
    ("a.b.org.ck", "org.ck", "b.org.ck"),
    ("org.ck", "org.ck", None),
    # exception beats the wildcard: www.ck IS registrable
    ("www.ck", "ck", "www.ck"),
    ("sub.www.ck", "ck", "www.ck"),
    # private-domain style rule: blogspot subdomains are distinct sites
    ("a.blogspot.com", "blogspot.com", "a.blogspot.com"),
    ("x.y.blogspot.com", "blogspot.com", "y.blogspot.com"),
    # default rule "*": unknown TLD's last label is the suffix
    ("example.xyz", "xyz", "example.xyz"),
    ("xyz", "xyz", None),
]


@pytest.fixture(scope="module")
def result(spark):
    hosts = spark.createDataFrame([(h,) for h, _, _ in CASES], ["hostname"])
    rules = spark.createDataFrame([(r,) for r in RULES], ["rule"])
    rows = domains.registrable_domain(hosts, rules).collect()
    return {r["hostname"]: (r["public_suffix"], r["site"]) for r in rows}


def test_psl_vectors(result):
    for host, suffix, site in CASES:
        assert result[host] == (suffix, site), (host, result[host])


def test_one_row_per_host(spark):
    hosts = spark.createDataFrame(
        [("a.example.com",), ("a.example.com",), ("b.co.uk",)], ["hostname"]
    )
    rules = spark.createDataFrame([(r,) for r in RULES], ["rule"])
    out = domains.registrable_domain(hosts, rules)
    assert out.count() == 3  # duplicates preserved, no explode leakage
    assert out.columns == ["hostname", "public_suffix", "site"]


def test_sql_oracle_parity(spark):
    hosts = spark.createDataFrame([(h,) for h, _, _ in CASES], ["hostname"])
    rules = spark.createDataFrame([(r,) for r in RULES], ["rule"])
    got = sorted(
        (r["hostname"], r["public_suffix"], r["site"])
        for r in domains.registrable_domain(hosts, rules).collect()
    )
    hosts_vals = ", ".join(f"('{h}')" for h, _, _ in CASES)
    rules_vals = ", ".join("('%s')" % r.replace("'", "''") for r in RULES)
    sql = domains.registrable_domain_sql(
        f"SELECT * FROM (VALUES {hosts_vals}) AS h(hostname)",
        f"SELECT * FROM (VALUES {rules_vals}) AS r(rule)",
    )
    want = sorted(duckdb.sql(sql).fetchall())
    assert got == want


def test_site_feeds_politeness_grouping(spark):
    """The roll-up a frontier actually performs: per-site counts over
    subdomain-sharded hosts (one site == one rate-limit bucket)."""
    hosts = spark.createDataFrame(
        [(f"shard{i}.example.co.uk",) for i in range(7)]
        + [(f"u{i}.blogspot.com",) for i in range(3)],
        ["hostname"],
    )
    rules = spark.createDataFrame([(r,) for r in RULES], ["rule"])
    per_site = (
        domains.registrable_domain(hosts, rules)
        .groupBy("site")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r["site"]: r["n"] for r in per_site.collect()}
    assert got["example.co.uk"] == 7
    # blogspot.com is a public suffix: each subdomain is its own site
    assert sum(1 for s in got if s and s.endswith("blogspot.com")) == 3
