"""Physical-plan quality gates: the plans Catalyst produces for our
operators must have the shapes the scale design depends on — broadcast for
tiny dims, pushed filters/pruned columns at the parquet scan, hash
aggregation (not sort) for keep-first-agg."""

import pytest
from pyspark.sql import functions as F

from starchart_spark.operators import dedup
from starchart_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_dims_join_is_broadcast(spark):
    fn, _ = QUERIES["broadcast_dims_join"]
    plan = _plan(fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_filter_pushdown_to_scan(spark):
    fn, _ = QUERIES["frontier_scan"]
    plan = _plan(fn(spark, SF_DIR))
    assert "PushedFilters: [" in plan and "c_mktsegment" in plan


def test_column_pruning(spark):
    """A 2-column projection must not read all columns from parquet."""
    fn, _ = QUERIES["frontier_scan"]
    plan = _plan(fn(spark, SF_DIR))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "c_custkey" in read_schema and "c_name" in read_schema
    assert "c_acctbal" not in read_schema and "c_nationkey" not in read_schema


def test_anti_join_shape(spark):
    fn, _ = QUERIES["seen_anti_join"]
    plan = _plan(fn(spark, SF_DIR))
    assert "LeftAnti" in plan


def test_keep_first_agg_has_partial_aggregation(spark):
    """The agg variant must combine map-side (partial_min_by BEFORE the
    exchange) — that's what shrinks the shuffle vs the window variant."""
    df = spark.createDataFrame([(i % 5, i) for i in range(100)], ["k", "o"])
    plan = _plan(dedup.keep_first_agg(df, ["k"], "o"))
    assert "partial_min_by" in plan
    assert plan.index("partial_min_by") > plan.index("Exchange")  # below = before


def test_consent_gate_broadcasts(spark):
    from starchart_spark.operators import politeness

    frontier = spark.range(100).select(F.concat(F.lit("h"), "id").alias("hostname"))
    consent = spark.createDataFrame(
        [("h1", True, True, None)],
        "hostname string, verified boolean, spidering boolean, rate_ms long",
    )
    plan = _plan(politeness.consent_gate(frontier, consent))
    assert "BroadcastHashJoin" in plan


def test_ordered_prefix_is_skew_proof(spark):
    """The global scan/rank primitive under suffix_ranks / waterfill /
    shuffle_positions: the corpus-sized sort must be the parallel range
    partitioner; the only full-data window must be partitioned by the
    range-partition id (never one task); the lone single-partition
    exchange may feed only the per-partition OFFSET aggregate (<=
    num_partitions rows); offsets come back broadcast."""
    from starchart_spark.operators import skew

    df = (
        spark.range(1000)
        .select(F.col("id").alias("k"))
        .withColumn("__one", F.lit(1))
    )
    plan = _plan(skew.ordered_prefix(df, "k", "__one"))
    assert "rangepartitioning" in plan
    # every row_number window (the corpus-sized local rank) is __pid-keyed
    for frag in plan.split("row_number() windowspecdefinition(")[1:]:
        assert frag.startswith("__pid")
    # a SinglePartition exchange is allowed ONLY under the tiny offsets
    # aggregate: its child must be the HashAggregate over __pid
    for frag in plan.split("Exchange SinglePartition")[1:]:
        nxt = [ln for ln in frag.splitlines()[1:3] if ln.strip()]
        assert any("HashAggregate(keys=[__pid" in ln for ln in nxt), plan
    assert "BroadcastHashJoin" in plan
