"""Deterministic sampling: partition invariance (the property df.sample()
lacks), fraction accuracy, stratified thresholds, exact-k reproducibility."""

from pyspark.sql import functions as F

from starchart_spark.operators import sampling


def _docs(spark, n=5000):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_fraction_partition_invariant(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in sampling.sample_fraction(df, 0.2).collect()}
    b = {
        r["doc_id"]
        for r in sampling.sample_fraction(df.repartition(13), 0.2).collect()
    }
    assert a == b
    assert 0.15 < len(a) / 5000 < 0.25


def test_fraction_salt_changes_sample(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in sampling.sample_fraction(df, 0.2, salt=0).collect()}
    c = {r["doc_id"] for r in sampling.sample_fraction(df, 0.2, salt=7).collect()}
    assert a != c


def test_fraction_nested_subset(spark):
    # a smaller fraction is a subset of a larger one (same salt): stable
    # incremental corpus growth
    df = _docs(spark)
    small = {r["doc_id"] for r in sampling.sample_fraction(df, 0.1).collect()}
    big = {r["doc_id"] for r in sampling.sample_fraction(df, 0.3).collect()}
    assert small < big


def test_stratified_thresholds(spark):
    df = spark.range(6000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    fr = spark.createDataFrame([("en", 0.5), ("de", 0.05)], ["lang", "fraction"])
    out = sampling.sample_stratified(df, fr, "lang").groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in out.collect()}
    assert 0.4 < got["en"] / 3000 < 0.6
    assert got["de"] / 3000 < 0.12
    # stratum missing from the dim is dropped entirely
    fr2 = spark.createDataFrame([("en", 0.5)], ["lang", "fraction"])
    assert (
        sampling.sample_stratified(df, fr2, "lang").filter(F.col("lang") == "de").count()
        == 0
    )


def test_fraction_predicate_reaches_scan(spark, tmp_path):
    """The sampling predicate must be a scan-level filter (no shuffle, no
    Python): the plan shows a Filter directly over the file scan and no
    exchange before it."""
    path = str(tmp_path / "docs.parquet")
    _docs(spark).write.parquet(path)
    plan = (
        sampling.sample_fraction(spark.read.parquet(path), 0.2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("Exchange", "ArrowEvalPython", "BatchEvalPython"):
        assert node not in plan
    assert "Filter" in plan and "FileScan parquet" in plan


def test_exact_k_reproducible(spark):
    df = _docs(spark)
    a = [r["doc_id"] for r in sampling.sample_exact_k(df, 50).collect()]
    b = [r["doc_id"] for r in sampling.sample_exact_k(df.repartition(7), 50).collect()]
    assert len(a) == 50 and sorted(a) == sorted(b)


def test_priority_sample_basics(spark):
    # weights: doc_id % 10 == 0 gets weight 100, everyone else 1 — the
    # heavy stratum (10% of rows) must dominate the sample
    df = _docs(spark).withColumn(
        "weight",
        F.when(F.col("doc_id") % 10 == 0, 100).otherwise(1).cast("long"),
    )
    out = sampling.priority_sample(df, 200, "weight").collect()
    assert len(out) == 200
    heavy = sum(1 for r in out if r["weight"] == 100)
    assert heavy > 150  # E[heavy] ≈ 200·(100·500)/(100·500+4500) ≈ 183


def test_priority_sample_partition_invariant(spark):
    df = _docs(spark).withColumn("weight", (F.col("doc_id") % 7 + 1).cast("long"))
    a = {r["doc_id"] for r in sampling.priority_sample(df, 100, "weight").collect()}
    b = {
        r["doc_id"]
        for r in sampling.priority_sample(df.repartition(11), 100, "weight").collect()
    }
    assert a == b and len(a) == 100


def test_priority_sample_salt_and_zero_weight(spark):
    df = _docs(spark).withColumn("weight", (F.col("doc_id") % 7 + 1).cast("long"))
    a = {r["doc_id"] for r in sampling.priority_sample(df, 100, "weight").collect()}
    c = {r["doc_id"] for r in sampling.priority_sample(df, 100, "weight", salt=3).collect()}
    assert a != c
    # zero-weight rows have priority 0: never selected while any positive
    # weight remains
    zw = _docs(spark, 300).withColumn(
        "weight", F.when(F.col("doc_id") < 150, 0).otherwise(5).cast("long")
    )
    got = sampling.priority_sample(zw, 150, "weight").collect()
    assert all(r["weight"] == 5 for r in got)
