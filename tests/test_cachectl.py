"""HTTP cache/revalidation decisions (operators/cachectl.py)."""

from __future__ import annotations

from starchart_spark.operators import cachectl

SCHEMA = (
    "url string, etag string, last_modified_s long, cache_control string,"
    " fetched_s long"
)
NOW = 10_000


def _decide(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r["url"]: (r["decision"], r["cond_header"], r["fresh_for_s"], r["age_s"])
        for r in cachectl.cache_decision(df, now_s=NOW).collect()
    }


def test_decision_matrix(spark):
    got = _decide(
        spark,
        [
            # fresh: max-age 100 > age 50
            ("fresh", None, None, "max-age=100", NOW - 50),
            # stale by max-age, etag -> revalidate via if-none-match
            ("reval-etag", '"abc"', None, "max-age=10", NOW - 50),
            # stale, only last-modified -> if-modified-since
            ("reval-lm", None, 9000, "max-age=10", NOW - 50),
            # heuristic freshness: (fetched-lm)/10 = 100 > age 50 -> fresh
            ("heuristic-fresh", None, NOW - 1050, None, NOW - 50),
            # heuristic stale: lifetime 10 < age 50 -> revalidate (lm validator)
            ("heuristic-stale", None, NOW - 150, None, NOW - 50),
            # no validators, no cc -> fetch
            ("bare", None, None, None, NOW - 50),
            # no-store always fetches, even with validators + fresh max-age
            ("nostore", '"x"', 9000, "no-store, max-age=9999", NOW - 1),
            # no-cache forces revalidation even inside max-age
            ("nocache", '"x"', None, "no-cache, max-age=9999", NOW - 1),
            # no-cache without validator -> fetch
            ("nocache-bare", None, None, "no-cache", NOW - 1),
            # etag preferred over last-modified
            ("both-validators", '"e"', 9000, "max-age=1", NOW - 50),
        ],
    )
    assert got["fresh"][0] == "fresh" and got["fresh"][1] is None
    assert got["reval-etag"][:2] == ("revalidate", "if-none-match")
    assert got["reval-lm"][:2] == ("revalidate", "if-modified-since")
    assert got["heuristic-fresh"][0] == "fresh"
    assert got["heuristic-fresh"][2] == 100
    assert got["heuristic-stale"][:2] == ("revalidate", "if-modified-since")
    assert got["bare"][:2] == ("fetch", None)
    assert got["nostore"][:2] == ("fetch", None)
    assert got["nocache"][:2] == ("revalidate", "if-none-match")
    assert got["nocache-bare"][:2] == ("fetch", None)
    assert got["both-validators"][1] == "if-none-match"


def test_max_age_extraction_is_token_delimited(spark):
    # s-maxage must NOT match max-age; case-insensitive; first token wins
    got = _decide(
        spark,
        [
            ("smax", None, None, "s-maxage=9999", NOW - 50),
            ("upper", None, None, "Max-Age=100", NOW - 50),
            ("listed", '"e"', None, "public, max-age=10, immutable", NOW - 50),
        ],
    )
    assert got["smax"][2] == 0 and got["smax"][0] == "fetch"
    assert got["upper"][0] == "fresh"
    assert got["listed"][:2] == ("revalidate", "if-none-match")


def test_age_and_lifetime_columns(spark):
    got = _decide(spark, [("u", None, None, "max-age=70", NOW - 30)])
    assert got["u"][3] == 30  # age_s
    assert got["u"][2] == 70  # fresh_for_s
    assert got["u"][0] == "fresh"


def test_no_exchange_in_plan(spark):
    """Scan-level enrichment: zero shuffles."""
    df = spark.createDataFrame([("u", None, None, None, 1)], SCHEMA)
    plan = (
        cachectl.cache_decision(df, now_s=NOW)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
