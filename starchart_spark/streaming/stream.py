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


# -- streaming frontier scheduler (SURVEY §2.10 upgrade, VERDICT r2 #6) ------

FRONTIER_EVENT = T.StructType(
    [
        T.StructField("hostname", T.StringType(), False),
        T.StructField("forge_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # visit | drained
        T.StructField("page", T.IntegerType(), False),
        T.StructField("idx_in_page", T.IntegerType(), False),
        T.StructField("doc_id", T.StringType(), True),  # null for drained
    ]
)

FRONTIER_STATE = T.StructType(
    [
        T.StructField("next_page", T.IntegerType(), False),
        T.StructField("active", T.BooleanType(), False),
        # pages fetched ahead of the cursor, JSON {page: {doc_id, repos}} —
        # file-source micro-batches deliver a host's pages in arbitrary
        # order; the walk only advances through CONTIGUOUS pages, exactly
        # the reference's strictly-sequential per-host page loop
        T.StructField("buffer_json", T.StringType(), False),
    ]
)


def shape_frontier_input(docs_stream: DataFrame, seeds: DataFrame) -> DataFrame:
    """Stateless pre-shaping (streaming-safe: filter/join/from_json only).

    Search-page documents → one MARKER row per page (idx 0, the page fetch
    itself — a sentinel page with zero repos still produces its marker,
    which is what lets the stateful walk terminate) + one row per parsed
    wire repo. ``seeds`` is the static (hostname, forge_id, forge_type)
    dimension, broadcast into the stream.
    """
    from starchart_spark.operators import normalize

    pages = docs_stream.filter(F.col("doc_id").rlike(r"[?&]page=\d+")).join(
        F.broadcast(seeds.select("hostname", "forge_id", "forge_type")), "hostname"
    )
    common = ["hostname", "forge_id", "forge_type", "page", "idx_in_page",
              "owner_username", "name", "is_marker", "doc_id"]
    markers = pages.select(
        "hostname",
        "forge_id",
        "forge_type",
        F.regexp_extract("doc_id", r"[?&]page=(\d+)", 1).cast("int").alias("page"),
        F.lit(0).alias("idx_in_page"),
        F.lit(None).cast("string").alias("owner_username"),
        F.lit(None).cast("string").alias("name"),
        F.lit(True).alias("is_marker"),
        "doc_id",
    ).select(common)
    repo_rows = (
        normalize.parse_search_pages_typed(
            pages.select("doc_id", "hostname", "spans", "forge_type")
        )
        .join(F.broadcast(seeds.select("hostname", "forge_id", "forge_type")), "hostname")
        .select(
            "hostname", "forge_id", "forge_type", "page", "idx_in_page",
            "owner_username", "name",
            F.lit(False).alias("is_marker"), "doc_id",
        )
        .select(common)
    )
    return markers.unionByName(repo_rows)


def _frontier_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-host page cursor as streaming state — the continuous variant of
    the batch loop (state = next_page/active, spider.rs:65-122). Arriving
    page documents buffer by page number; the cursor walks contiguous pages
    emitting the page visit (idx 0) and, for gitea, one topic visit per
    repo in page order (S4); a zero-repo page is the A2 sentinel: its
    visit IS emitted, then the host drains (kind='drained' carries the
    final next_page for end-state comparison against the batch engine)."""
    import json

    if state.exists:
        next_page, active, buf_json = state.get
        buffer = json.loads(buf_json)
    else:
        next_page, active, buffer = 1, True, {}
    host = key[0]
    forge_id = None
    forge_type = None
    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            forge_id = int(r.forge_id)
            forge_type = r.forge_type
            ent = buffer.setdefault(str(int(r.page)), {"doc_id": None, "repos": []})
            if r.is_marker:
                ent["doc_id"] = r.doc_id
            else:
                ent["repos"].append([int(r.idx_in_page), r.owner_username, r.name])
    rows = []
    while active:
        ent = buffer.get(str(next_page))
        if ent is None or ent["doc_id"] is None:
            break
        del buffer[str(next_page)]
        rows.append((host, forge_id, "visit", next_page, 0, ent["doc_id"]))
        repos = sorted(ent["repos"])
        if forge_type == "gitea":  # S4: only gitea needs the topics fetch
            for idx, owner, name in repos:
                rows.append(
                    (host, forge_id, "visit", next_page, idx,
                     f"https://{host}/api/v1/repos/{owner}/{name}/topics")
                )
        if not repos:
            active = False
            rows.append((host, forge_id, "drained", next_page, 0, None))
        else:
            next_page += 1
    state.update((next_page, active, json.dumps(buffer)))
    if rows:
        yield pd.DataFrame(
            rows,
            columns=["hostname", "forge_id", "kind", "page", "idx_in_page", "doc_id"],
        )


def streaming_frontier_scheduler(
    docs_stream: DataFrame, seeds: DataFrame
) -> DataFrame:
    """The crawl frontier as a continuous stateful stream: page documents
    arrive (in any order, across any micro-batch boundaries), visit events
    leave in the reference's per-host sequential order. Equality with the
    batch engine's visit log / final state on the same corpus is asserted
    by tests/test_streaming.py."""
    shaped = shape_frontier_input(docs_stream, seeds)
    return shaped.groupBy("hostname").applyInPandasWithState(
        _frontier_fn,
        outputStructType=FRONTIER_EVENT,
        stateStructType=FRONTIER_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
