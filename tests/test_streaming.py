"""Structured Streaming surface: incremental ingest via foreachBatch +
AvailableNow, and the stateful leaky-bucket limiter."""

import os

import pytest
from pyspark.sql import functions as F

from starchart_spark.crawl.corpus import CorpusSpec, make_corpus
from starchart_spark.crawl.engine import CrawlEngine, CrawlSettings
from starchart_spark.streaming import stream
from starchart_spark.testing import corpus_to_spark


def test_incremental_ingest(spark, tmp_path):
    corpus = make_corpus(CorpusSpec(n_forges=2, repos_per_forge=20))
    dfs = corpus_to_spark(spark, corpus)
    drop_dir = str(tmp_path / "drops")
    dfs["documents"].write.parquet(drop_dir)

    eng = CrawlEngine(spark, str(tmp_path / "wh"), CrawlSettings(host_buckets=4))
    docs = stream.stream_documents(spark, drop_dir)
    q = stream.incremental_ingest(eng, docs, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    assert eng.users.read(spark).count() == 2  # 'bot' per forge
    assert eng.repositories.read(spark).count() == 40
    # replay the same drop: idempotent (exactly-once effect)
    docs2 = stream.stream_documents(spark, drop_dir)
    q2 = stream.incremental_ingest(eng, docs2, str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    assert eng.repositories.read(spark).count() == 40


def test_stateful_rate_limiter(spark, tmp_path):
    src_dir = str(tmp_path / "events")
    rows = [("p1", i) for i in range(60)] + [("p2", i) for i in range(5)]
    spark.createDataFrame(rows, ["peer", "i"]).write.parquet(src_dir)
    events = (
        spark.readStream.schema("peer string, i long").parquet(src_dir)
    )
    out_rows = []

    def _sink(df, bid):
        out_rows.extend(df.collect())

    q = (
        stream.stateful_rate_limiter(events)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["peer"]: (r["count_in_window"], r["over_limit"]) for r in out_rows}
    assert got["p1"] == (60, True)
    assert got["p2"] == (5, False)


def test_streaming_frontier_equals_batch_engine(spark, tmp_path):
    """VERDICT r2 #6: the applyInPandasWithState frontier scheduler must
    replay the e2e corpus (all three forge types) with a visit sequence and
    final per-host state identical to the batch engine's — page documents
    arrive one file per micro-batch in arbitrary order, so the per-host
    page cursor must buffer ahead and advance only through contiguous
    pages."""
    spec = CorpusSpec(
        n_forges=3,
        repos_per_forge=30,
        page_size=10,
        forge_types=("gitea", "github", "sourcehut"),
    )
    dfs = corpus_to_spark(spark, make_corpus(spec))

    # batch engine = the reference behavior
    eng = CrawlEngine(
        spark,
        str(tmp_path / "wh"),
        CrawlSettings(host_buckets=4, items_per_api_call=10),
    )
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    eng.run(dfs["documents"])
    batch_visits = sorted(
        tuple(r)
        for r in eng.visit_log.read(spark)
        .select("hostname", "forge_id", "page", "idx_in_page", "doc_id")
        .collect()
    )
    batch_state = {
        r["hostname"]: (r["next_page"], r["active"])
        for r in eng.state.read(spark).collect()
    }

    # streaming scheduler over the same corpus, one file per micro-batch
    src = str(tmp_path / "docs_src")
    dfs["documents"].select("doc_id", "spans", "hostname").repartition(7).write.parquet(src)
    seeds = eng.state.read(spark).select("hostname", "forge_id", "forge_type")
    docs_stream = (
        spark.readStream.schema(stream.DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    events = stream.streaming_frontier_scheduler(docs_stream, seeds)
    q = (
        events.writeStream.format("memory")
        .queryName("frontier_events")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from frontier_events")

    stream_visits = sorted(
        tuple(r)
        for r in got.filter(F.col("kind") == "visit")
        .select("hostname", "forge_id", "page", "idx_in_page", "doc_id")
        .collect()
    )
    assert stream_visits == batch_visits

    drained = {
        r["hostname"]: (r["page"], False)
        for r in got.filter(F.col("kind") == "drained").collect()
    }
    assert drained == batch_state
