"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline on sf0.001; ``queries()`` /
``oracle_sql()`` expose the operator registry in
``starchart_spark/queries.py`` — one entry per implemented operator from
SURVEY.md §2 plus the training-data pipeline suite, each with a DuckDB
oracle where the semantics are SQL-expressible (approximate ops — LSH ANN,
SimHash — are rows-only by design and are verified against exact
recomputation in pytest instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from starchart_spark.queries import QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: a crawl-shaped training-data pipeline over sf0.001 —
    canonicalize+hash keys, quality-score and language-ID every document,
    exact-dedup survivors, aggregate per (source, lang_pred)."""
    from starchart_spark.operators import dedup_text, text

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    enriched = text.lang_id(text.quality_features(docs))
    survivors = dedup_text.exact_dedup(docs)
    kept = enriched.join(survivors, "doc_id")
    return (
        kept.groupBy("source", "lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality_score"), 6).alias("avg_quality"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("source", "lang_pred")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
