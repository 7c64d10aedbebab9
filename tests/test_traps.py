"""Crawl-trap heuristics: each flag fires on its family and stays quiet on
clean URLs; drop_traps composes as a frontier filter."""

from pyspark.sql import functions as F

from starchart_spark.operators import traps


def _flags(spark, path, query=""):
    df = spark.createDataFrame([(1, path, query)], ["doc_id", "path", "query"])
    return traps.trap_flags(df).collect()[0]


def test_clean_url_untouched(spark):
    r = _flags(spark, "/owner/repo/src/branch/main", "page=2")
    assert not r["is_trap"]
    assert not any(
        r[c] for c in ["trap_depth", "trap_repeat", "trap_session",
                       "trap_calendar", "trap_longqs"]
    )


def test_depth(spark):
    deep = "/" + "/".join(f"s{i}" for i in range(13))
    assert _flags(spark, deep)["trap_depth"]
    assert not _flags(spark, "/" + "/".join(f"s{i}" for i in range(12)))["trap_depth"]


def test_repeated_segment(spark):
    # the classic relative-link loop: /a/b/a/c/a/
    assert _flags(spark, "/a/b/a/c/a")["trap_repeat"]
    assert not _flags(spark, "/a/b/a/c")["trap_repeat"]  # twice is normal


def test_session_id(spark):
    assert _flags(spark, "/p", "PHPSESSID=9f8e7d6c")["trap_session"]
    assert _flags(spark, "/p", "a=1&sid=XYZ123")["trap_session"]
    assert not _flags(spark, "/p", "side=left&version=2")["trap_session"]


def test_calendar(spark):
    assert _flags(spark, "/2020/2021/x")["trap_calendar"]  # two years
    assert _flags(spark, "/9999/01/02")["trap_calendar"]  # out of window
    assert not _flags(spark, "/2021/05/12/post")["trap_calendar"]  # one sane year
    assert not _flags(spark, "/v1234abc/2020")["trap_calendar"]  # non-year segs


def test_long_query(spark):
    assert _flags(spark, "/p", "f=" + "v" * 130)["trap_longqs"]
    assert not _flags(spark, "/p", "f=" + "v" * 100)["trap_longqs"]


def test_null_query_is_clean(spark):
    df = spark.createDataFrame(
        [(1, "/a/b", None)], "doc_id long, path string, query string"
    )
    r = traps.trap_flags(df).collect()[0]
    assert not r["is_trap"]


def test_drop_traps_filters_and_keeps_schema(spark):
    df = spark.createDataFrame(
        [
            (1, "/ok/path", "q=1"),
            (2, "/x/x/x", "q=2"),
            (3, "/fine", "sessionid=AB12"),
        ],
        ["doc_id", "path", "query"],
    )
    out = traps.drop_traps(df)
    assert out.columns == ["doc_id", "path", "query"]
    assert {r["doc_id"] for r in out.collect()} == {1}
