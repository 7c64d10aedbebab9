"""Structured Streaming surface (SURVEY.md §2.10).

The reference daemon is an unbounded micro-batch loop over DB state
(/root/reference/src/spider.rs:175-223) — no watermarks or event-time
semantics. The natural Spark mapping is what crawl/engine.py already does
(driver-orchestrated batches over snapshot tables). This module adds the
genuinely streaming pieces for deployments that want them:

- ``stream_documents`` + ``incremental_ingest``: new page documents landing
  in a directory are parsed/deduped/merged exactly once per micro-batch via
  ``foreachBatch`` + ``Trigger.AvailableNow`` — the idempotent merge sinks
  make replays safe (same contract as engine resume).
- ``stateful_rate_limiter``: the P6 leaky bucket as
  ``applyInPandasWithState`` with a processing-time timeout standing in for
  the reference's GC sweep (src/master.rs:63-106, gc=45 s): per-peer event
  counts age out of state exactly like idle Counter actors being reaped.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from starchart_spark import tables

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(tables.SPAN), False),
        T.StructField("hostname", T.StringType(), False),
    ]
)


def stream_documents(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of interleaved documents (one parquet drop per
    crawl fetch batch)."""
    return (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def incremental_ingest(engine, docs_stream: DataFrame, checkpoint_dir: str):
    """foreachBatch bridge into the engine's merge sinks: each micro-batch of
    fetched pages is normalized and merged insert-if-absent; the streaming
    checkpoint plus idempotent MERGE give effective exactly-once."""
    from starchart_spark.operators import dedup, normalize

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        search_docs, topics_docs = normalize.split_documents(batch_df)
        parsed = normalize.parse_gitea_search_pages(
            search_docs.select("doc_id", "hostname", "spans")
        )
        if parsed.isEmpty():
            return
        repo_rows = parsed.withColumn(
            "forge_url", F.concat(F.lit("https://"), F.col("hostname"), F.lit("/"))
        )
        topics = normalize.parse_gitea_topics_pages(
            topics_docs.select("doc_id", "hostname", "spans")
        )
        users = dedup.keep_first(
            normalize.normalize_users(repo_rows),
            ["hostname", "username"],
            ["page", "idx_in_page"],
        )
        repos = normalize.normalize_repositories(repo_rows, topics)
        engine.users.merge_insert(engine.spark, users, {"stream_batch": batch_id})
        engine.repositories.merge_insert(engine.spark, repos, {"stream_batch": batch_id})

    return (
        docs_stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


LIMITER_OUT = T.StructType(
    [
        T.StructField("peer", T.StringType(), False),
        T.StructField("count_in_window", T.LongType(), False),
        T.StructField("over_limit", T.BooleanType(), False),
    ]
)

LIMITER_STATE = T.StructType([T.StructField("count", T.LongType(), False)])


def _limiter_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Leaky bucket per peer: accumulate counts; state times out (GC) after
    54 s idle, mirroring counter decay + master GC."""
    if state.hasTimedOut:
        state.remove()
        return
    count = state.get[0] if state.exists else 0
    for pdf in pdfs:
        count += len(pdf)
    state.update((count,))
    state.setTimeoutDuration(54 * 1000)
    yield pd.DataFrame(
        {"peer": [key[0]], "count_in_window": [count], "over_limit": [count > 50]}
    )


def stateful_rate_limiter(events: DataFrame, peer_col: str = "peer") -> DataFrame:
    """P6/P7 as a stateful streaming operator."""
    return events.groupBy(peer_col).applyInPandasWithState(
        _limiter_fn,
        outputStructType=LIMITER_OUT,
        stateStructType=LIMITER_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
