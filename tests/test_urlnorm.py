"""Deep-URL normalization: RFC 3986 vectors, crawl extras, oracle parity."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from starchart_spark.functions import urls

CASES = [
    # (raw, expected)
    ("HTTP://WWW.Example.COM/a/b", "http://www.example.com/a/b"),
    ("http://ex.com:80/x", "http://ex.com/x"),
    ("https://ex.com:443/", "https://ex.com/"),
    ("https://ex.com:8443/", "https://ex.com:8443/"),
    ("http://user:pw@ex.com/p", "http://ex.com/p"),
    ("http://ex.com", "http://ex.com/"),
    ("http://ex.com/a//b///c", "http://ex.com/a/b/c"),
    ("http://ex.com/a/./b/.", "http://ex.com/a/b/"),
    ("http://ex.com/a/b/../c", "http://ex.com/a/c"),
    ("http://ex.com/a/b/../../c", "http://ex.com/c"),
    ("http://ex.com/a/..", "http://ex.com/"),
    ("http://ex.com/../../a", "http://ex.com/a"),
    ("http://ex.com/..a/b", "http://ex.com/..a/b"),  # '..a' is a real segment
    ("http://ex.com/p#frag", "http://ex.com/p"),
    ("http://ex.com/p?b=2&a=1", "http://ex.com/p?a=1&b=2"),
    ("http://ex.com/p?utm_source=x&a=1&fbclid=9", "http://ex.com/p?a=1"),
    ("http://ex.com/p?utm_source=x", "http://ex.com/p"),
    ("http://ex.com/p?a=1&&b=2", "http://ex.com/p?a=1&b=2"),
    ("not a url", None),
    ("mailto:x@y", None),
]


def test_vectors(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    got = {
        r["url"]: r["norm"]
        for r in df.select(
            "url", urls.deep_url_normalize("url").alias("norm")
        ).collect()
    }
    for raw, want in CASES:
        assert got[raw] == want, (raw, got[raw], want)


def test_dedup_collapses_aliases(spark):
    """The point of the operator: all aliases of one resource map to ONE
    frontier key."""
    aliases = [
        "HTTP://EX.com:80/a/./b/../c?z=1&utm_medium=m&y=2#top",
        "http://user@ex.com/a//c?y=2&z=1",
        "http://ex.com/x/../a/c?z=1&&y=2",
    ]
    df = spark.createDataFrame([(u,) for u in aliases], ["url"])
    keys = df.select(urls.deep_url_normalize("url").alias("k")).distinct().collect()
    assert len(keys) == 1
    assert keys[0]["k"] == "http://ex.com/a/c?y=2&z=1"


def test_bounded_dotdot_documented_residual(spark):
    """Nesting deeper than MAX_DOTDOT_PASSES leaves a residual rather than
    looping forever — the documented bounded-pass trade."""
    # each pass folds one pair per contiguous nest run, so depth ≤ passes
    # resolves fully...
    ok = "http://ex.com/" + "a/" * urls.MAX_DOTDOT_PASSES + "../" * urls.MAX_DOTDOT_PASSES + "end"
    # ...and deeper input terminates with a residual instead of looping
    deep = "http://ex.com/" + "a/" * 20 + "../" * 20 + "end"
    df = spark.createDataFrame([(ok,), (deep,)], ["url"])
    got = [
        r["n"]
        for r in df.select(urls.deep_url_normalize("url").alias("n"))
        .orderBy(F.length("url"))
        .collect()
    ]
    assert got[0] == "http://ex.com/end"
    assert got[1].endswith("/end") and ".." in got[1]


def test_sql_oracle_parity(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    got = sorted(
        (r["url"], r["norm"])
        for r in df.select(
            "url", urls.deep_url_normalize("url").alias("norm")
        ).collect()
    )
    vals = ", ".join("('%s')" % u.replace("'", "''") for u, _ in CASES)
    sql = (
        f"SELECT url, {urls.deep_url_normalize_sql('url')} AS norm "
        f"FROM (VALUES {vals}) AS t(url)"
    )
    want = sorted((r[0], r[1]) for r in duckdb.sql(sql).fetchall())
    assert got == want
