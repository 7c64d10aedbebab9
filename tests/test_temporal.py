"""As-of join and range join semantics (operators/temporal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from starchart_spark.operators import temporal


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# ------------------------------------------------------------- asof_join ----


def test_asof_basic_latest_at_or_before(spark):
    trades = _df(
        spark,
        [(1, "k", 100), (2, "k", 205), (3, "k", 50)],
        "trade_id long, sym string, ts long",
    )
    quotes = _df(
        spark,
        [(10, "k", 90), (11, "k", 200), (12, "k", 205)],
        "quote_id long, sym string, ts long",
    )
    out = {
        r.trade_id: r.quote_id_right
        for r in temporal.asof_join(
            trades, quotes.select("sym", "quote_id", "ts"),
            on="sym", ts_col="ts", right_id_col="quote_id",
        ).collect()
    }
    assert out[1] == 10          # 90 <= 100, 200 is later
    assert out[2] == 12          # equal ts matches (inclusive)
    assert out[3] is None        # nothing at-or-before 50


def test_asof_keys_do_not_leak(spark):
    left = _df(spark, [(1, "a", 100), (2, "b", 100)], "id long, k string, ts long")
    right = _df(spark, [(9, "a", 50)], "rid long, k string, ts long")
    out = {
        r.id: r.rid_right
        for r in temporal.asof_join(
            left, right.select("k", "rid", "ts"), on="k", ts_col="ts",
            right_id_col="rid",
        ).collect()
    }
    assert out[1] == 9 and out[2] is None


def test_asof_tie_break_largest_id(spark):
    left = _df(spark, [(1, "k", 100)], "id long, k string, ts long")
    right = _df(
        spark, [(7, "k", 100), (8, "k", 100)], "rid long, k string, ts long"
    )
    out = temporal.asof_join(
        left, right.select("k", "rid", "ts"), on="k", ts_col="ts",
        right_id_col="rid",
    ).collect()
    assert out[0].rid_right == 8


def test_asof_tolerance_nulls_stale_matches(spark):
    left = _df(spark, [(1, "k", 1000), (2, "k", 120)], "id long, k string, ts long")
    right = _df(spark, [(9, "k", 100)], "rid long, k string, ts long")
    out = {
        r.id: r.rid_right
        for r in temporal.asof_join(
            left, right.select("k", "rid", "ts"), on="k", ts_col="ts",
            right_id_col="rid", tolerance_ms=50,
        ).collect()
    }
    assert out[1] is None  # 900ms stale > 50ms tolerance
    assert out[2] == 9     # 20ms fresh


def test_asof_deterministic_under_repartition(spark):
    left = _df(
        spark,
        [(i, f"k{i % 3}", (i * 37) % 500) for i in range(60)],
        "id long, k string, ts long",
    )
    right = _df(
        spark,
        [(i + 1000, f"k{i % 3}", (i * 53) % 500) for i in range(40)],
        "rid long, k string, ts long",
    )
    args = dict(on="k", ts_col="ts", right_id_col="rid")
    a = sorted(
        (r.id, r.rid_right)
        for r in temporal.asof_join(left, right.select("k", "rid", "ts"), **args).collect()
    )
    b = sorted(
        (r.id, r.rid_right)
        for r in temporal.asof_join(
            left.repartition(7), right.select("k", "rid", "ts").repartition(5), **args
        ).collect()
    )
    assert a == b and len(a) == 60


def test_asof_single_exchange_no_join(spark):
    left = _df(spark, [(1, "k", 100)], "id long, k string, ts long")
    right = _df(spark, [(9, "k", 50)], "rid long, k string, ts long")
    plan = (
        temporal.asof_join(left, right.select("k", "rid", "ts"), on="k",
                           ts_col="ts", right_id_col="rid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan  # pure union + window, no join operator


# ------------------------------------------------------------ range_join ----


def test_range_join_containment_half_open(spark):
    points = _df(spark, [(1, "k", 10), (2, "k", 20), (3, "k", 5)],
                 "pid long, k string, t long")
    ivs = _df(spark, [(100, "k", 10, 20)],
              "iv long, k string, s long, e long")
    out = sorted(
        r.pid
        for r in temporal.range_join(
            points, ivs, on="k", point_col="t", start_col="s", end_col="e",
            bucket_width=7,
        ).collect()
    )
    assert out == [1]  # start inclusive, end exclusive, 5 outside


def test_range_join_matches_bnl_reference(spark):
    points = _df(
        spark,
        [(i, f"k{i % 4}", (i * 13) % 300) for i in range(80)],
        "pid long, k string, t long",
    )
    ivs = _df(
        spark,
        [(i, f"k{i % 4}", (i * 31) % 250, (i * 31) % 250 + 40) for i in range(20)],
        "iv long, k string, s long, e long",
    )
    got = sorted(
        (r.pid, r.iv)
        for r in temporal.range_join(
            points, ivs, on="k", point_col="t", start_col="s", end_col="e",
            bucket_width=25,
        ).collect()
    )
    want = sorted(
        (r.pid, r.iv)
        for r in points.join(
            ivs, ["k"]
        ).filter((F.col("t") >= F.col("s")) & (F.col("t") < F.col("e"))).collect()
    )
    assert got == want and len(got) > 0


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    # interval spanning many buckets must still yield each pair once
    points = _df(spark, [(1, "k", 55)], "pid long, k string, t long")
    ivs = _df(spark, [(9, "k", 0, 1000)], "iv long, k string, s long, e long")
    out = temporal.range_join(
        points, ivs, on="k", point_col="t", start_col="s", end_col="e",
        bucket_width=10,
    ).collect()
    assert len(out) == 1


def test_range_join_is_equi_join_not_bnl(spark):
    points = _df(spark, [(1, "k", 10)], "pid long, k string, t long")
    ivs = _df(spark, [(9, "k", 0, 100)], "iv long, k string, s long, e long")
    plan = (
        temporal.range_join(points, ivs, on="k", point_col="t",
                            start_col="s", end_col="e", bucket_width=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
