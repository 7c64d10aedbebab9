"""Test helpers: lift the pandas corpus into typed Spark DataFrames."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from starchart_spark import tables
from starchart_spark.crawl.corpus import Corpus

DOC_INPUT = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(tables.SPAN), False),
        T.StructField("hostname", T.StringType(), False),
    ]
)

GOLDEN_USERS = T.StructType([f for f in tables.USERS.fields])
GOLDEN_REPOS = T.StructType([f for f in tables.REPOSITORIES.fields])


def _records(pdf):
    recs = pdf.to_dict("records")
    for r in recs:
        for k, v in r.items():
            if isinstance(v, float) and math.isnan(v):
                r[k] = None
    return recs


def corpus_to_spark(spark: SparkSession, corpus: Corpus) -> dict[str, DataFrame]:
    return {
        "seed_forges": spark.createDataFrame(
            _records(corpus.seed_forges), tables.SEED_FORGES
        ),
        "consent": spark.createDataFrame(_records(corpus.consent), tables.CONSENT),
        "documents": spark.createDataFrame(_records(corpus.documents), DOC_INPUT),
        "golden_users": spark.createDataFrame(
            _records(corpus.golden_users), GOLDEN_USERS
        ),
        "golden_repositories": spark.createDataFrame(
            _records(corpus.golden_repositories), GOLDEN_REPOS
        ),
        "golden_crawl_order": spark.createDataFrame(
            _records(corpus.golden_crawl_order), tables.CRAWL_ORDER
        ),
    }
