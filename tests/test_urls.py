"""D1 canonicalization vs the reference's clean_url semantics
(/root/reference/db/db-core/src/lib.rs:81-89 + rust url crate normalization:
lowercase scheme/host, default port dropped, path/query/fragment stripped,
trailing slash kept)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from starchart_spark.functions.urls import (
    canonicalize_series,
    canonicalize_udf,
    hostname_series,
    url_hash,
)

CASES = [
    ("https://git.batsense.net/realaravinth/starchart?tab=readme#top", "https://git.batsense.net/"),
    ("https://example.com/deep/path/", "https://example.com/"),
    ("HTTPS://EXAMPLE.COM/Path", "https://example.com/"),
    ("http://example.com:80/x", "http://example.com/"),
    ("https://example.com:443/x", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/"),
    ("http://localhost:8080", "http://localhost:8080/"),
    ("https://example.com", "https://example.com/"),
    ("https://user:pw@example.com/x", "https://user:pw@example.com/"),
    ("not a url", None),
    ("", None),
]


def test_canonicalize_series():
    got = canonicalize_series(pd.Series([c[0] for c in CASES]))
    for (raw, want), g in zip(CASES, got):
        assert (None if pd.isna(g) else g) == want, raw


def test_hostname_series():
    got = hostname_series(pd.Series(["https://Git.Example.com:8443/a/b", "nope"]))
    assert got[0] == "git.example.com"
    assert pd.isna(got[1])


def test_canonicalize_udf_and_hash(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], ["url"])
    out = (
        df.withColumn("canon", canonicalize_udf(F.col("url")))
        .withColumn("h", url_hash("canon"))
        .collect()
    )
    by_url = {r["url"]: r for r in out}
    for raw, want in CASES:
        assert by_url[raw]["canon"] == want
    # same canonical form ⇒ same hash (the seen-set key property)
    a = by_url["http://example.com:80/x"]
    assert a["canon"] == "http://example.com/"


def test_idempotent():
    once = canonicalize_series(pd.Series([c[0] for c in CASES if c[1]]))
    twice = canonicalize_series(once)
    assert list(once) == list(twice)


@pytest.mark.parametrize("n", [10_000])
def test_vectorized_throughput_smoke(n):
    # guard against accidental per-row apply() regressions: 10k URLs must
    # canonicalize in well under a second
    import time

    urls = pd.Series([f"https://forge-{i % 97:04d}.test/p/{i}?q={i}#f" for i in range(n)])
    t0 = time.time()
    out = canonicalize_series(urls)
    assert (time.time() - t0) < 1.0
    assert out.notna().all()


def test_canonicalize_via_dim_equals_udf(spark):
    """The O(distinct-hosts) dim path must agree with the per-row UDF."""
    from starchart_spark.functions.urls import canonicalize_via_dim

    urls = [
        (i, f"HTTPS://Forge-{i % 9}.Test:8443/p/{i}?q=1#f") for i in range(500)
    ] + [(999, "not a url")]
    df = spark.createDataFrame(urls, ["id", "url"])
    via_dim = {
        r["id"]: r["canonical_host"]
        for r in canonicalize_via_dim(df, "url").collect()
    }
    per_row = {
        r["id"]: r["c"]
        for r in df.withColumn("c", canonicalize_udf(F.col("url"))).collect()
    }
    assert via_dim == per_row
