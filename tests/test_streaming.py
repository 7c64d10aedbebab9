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


class _FakeGroupState:
    """Minimal GroupState stand-in to drive the cursor round by round with
    deterministic micro-batch boundaries (a real stream's boundaries depend
    on file arrival; parity with the batch engine's per-batch deferral
    needs aligned rounds)."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        pass


def test_streaming_budget_deferral_equals_batch_engine(spark, tmp_path):
    """VERDICT r3 #3: under a non-zero politeness rate and a finite budget,
    the stateful frontier cursor must (a) emit per ROUND exactly the visits
    the batch engine performs in the same-numbered batch, (b) defer exactly
    the rows the batch engine's pending table holds after that batch, and
    (c) converge to the same final per-host (next_page, active) state."""
    RATE, BUDGET = 1000, 3500  # 4 fetch slots per host per round
    spec = CorpusSpec(n_forges=2, repos_per_forge=12, page_size=6)
    dfs = corpus_to_spark(spark, make_corpus(spec))

    eng = CrawlEngine(
        spark,
        str(tmp_path / "wh_budget"),
        CrawlSettings(
            host_buckets=4, items_per_api_call=6, rate_ms=RATE, budget_ms=BUDGET
        ),
    )
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    eng.run(dfs["documents"])

    batch_visits: dict[int, set] = {}
    for r in eng.visit_log.read(spark).collect():
        batch_visits.setdefault(int(r["batch_id"]), set()).add(
            (r["hostname"], r["page"], r["idx_in_page"])
        )
    pend_by_round: dict[int, set] = {}
    for snap in eng.pending.snapshots():
        b = snap.summary.get("batch_id")
        if not isinstance(b, int) or b < 1:
            continue
        pend_by_round[b] = {
            (r["hostname"], r["page"], r["idx_in_page"])
            for r in eng.pending.read(spark, snapshot_id=snap.snapshot_id).collect()
        }
    batch_state = {
        r["hostname"]: (r["next_page"], r["active"])
        for r in eng.state.read(spark).collect()
    }

    # stream side: shaping is stateless, so run it on the static documents
    # DataFrame and drive the budgeted cursor per host with aligned rounds —
    # all pages buffered up front (round 1), then empty continuation rounds
    seeds = eng.state.read(spark).select("hostname", "forge_id", "forge_type")
    shaped = stream.shape_frontier_input(
        dfs["documents"].select("doc_id", "spans", "hostname"), seeds
    ).toPandas()
    fn = stream.make_frontier_fn(rate_ms=RATE, budget_ms=BUDGET)
    stream_visits: dict[int, set] = {}
    stream_defers: dict[int, set] = {}
    stream_state = {}
    for host, pdf in shaped.groupby("hostname"):
        st = _FakeGroupState()
        rnd = 1
        out = list(fn((host,), [pdf.reset_index(drop=True)], st))
        for _guard in range(200):
            for o in out:
                for r in o.itertuples(index=False):
                    key = (r.hostname, int(r.page), int(r.idx_in_page))
                    if r.kind == "visit":
                        stream_visits.setdefault(rnd, set()).add(key)
                    elif r.kind == "defer":
                        stream_defers.setdefault(rnd, set()).add(key)
            next_page, active = st.get[0], st.get[1]
            if not active:
                break
            rnd += 1
            st.hasTimedOut = True
            out = list(fn((host,), [], st))
        stream_state[host] = (int(next_page), bool(active))

    assert stream_visits == batch_visits
    for rnd in pend_by_round:
        assert stream_defers.get(rnd, set()) == pend_by_round[rnd], rnd
    assert stream_state == batch_state


def test_streaming_budget_real_stream_drains(spark, tmp_path):
    """Real-stream smoke of budgeted mode: all documents arrive in the
    FIRST micro-batch; the host's remaining work must drain through
    processing-time TIMEOUT continuation rounds (no new data ever arrives),
    visiting every fetch exactly once and emitting the drained marker."""
    import time

    spec = CorpusSpec(n_forges=1, repos_per_forge=6, page_size=6)
    dfs = corpus_to_spark(spark, make_corpus(spec))
    src = str(tmp_path / "budget_src")
    dfs["documents"].select("doc_id", "spans", "hostname").write.parquet(src)
    seeds = (
        dfs["documents"].select("hostname").distinct()
        .select(
            "hostname",
            F.lit(1).cast("long").alias("forge_id"),
            F.lit("gitea").alias("forge_type"),
        )
    )
    docs_stream = (
        spark.readStream.schema(stream.DOC_STREAM_SCHEMA).parquet(src)
    )
    events = stream.streaming_frontier_scheduler(
        docs_stream, seeds, rate_ms=100, budget_ms=250  # 3 fetch slots/round
    )
    q = (
        events.writeStream.format("memory")
        .queryName("budget_events")
        .option("checkpointLocation", str(tmp_path / "budget_ckpt"))
        .outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    drained = stream.drain_frontier(
        spark, q, "budget_events", n_hosts=1, timeout_s=120
    )
    assert drained == 1, "host did not drain via timeout continuation"
    visits = sorted(
        (r["page"], r["idx_in_page"])
        for r in spark.sql(
            "select page, idx_in_page from budget_events where kind='visit'"
        ).collect()
    )
    # page 1: page fetch + 6 topics; page 2: sentinel fetch — each ONCE
    assert visits == [(1, i) for i in range(7)] + [(2, 0)]


def test_streaming_exact_dedup_matches_batch(spark, tmp_path):
    """Streaming exact dedup ≡ batch exact_dedup on the same drop (single
    watermark window), duplicates dropped across micro-batch boundaries."""
    import pyspark.sql.functions as F
    from starchart_spark.operators import dedup_text

    rows = [
        (1, "alpha text", "2026-01-01 00:00:01"),
        (2, "beta text", "2026-01-01 00:00:02"),
        (3, "alpha text", "2026-01-01 00:00:03"),  # dup of 1
        (4, "gamma text", "2026-01-01 00:00:04"),
        (5, "beta text", "2026-01-01 00:00:05"),   # dup of 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    drop_dir = str(tmp_path / "docs")
    # one file per row → several micro-batches under maxFilesPerTrigger=1
    df.repartition(5, "doc_id").write.parquet(drop_dir)

    src = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        stream.streaming_exact_dedup(src)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got_texts = sorted(r.text for r in spark.read.parquet(out_dir).collect())
    assert got_texts == ["alpha text", "beta text", "gamma text"]
    # batch parity on the surviving text set
    batch_ids = dedup_text.exact_dedup(df.select("doc_id", "text"))
    batch_texts = sorted(
        r.text for r in df.join(batch_ids, "doc_id").select("text").collect()
    )
    assert batch_texts == got_texts


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    """Streaming HLL registers (complete-mode max aggregate) == batch
    registers on the same rows, across several micro-batches — the
    bounded-state streaming cardinality path."""
    import pyspark.sql.functions as F
    from starchart_spark.operators import sketch

    df = spark.range(2_000).select(
        (F.col("id") % 3).cast("int").alias("g"), F.col("id").alias("key")
    )
    drop_dir = str(tmp_path / "keys")
    df.repartition(4, "key").write.parquet(drop_dir)

    src = (
        spark.readStream.schema("g int, key long")
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    q = (
        stream.streaming_hll_registers(src, "key", ["g"], b=8, portable=True)
        .writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        map(tuple, spark.sql("SELECT g, bucket, rho FROM hll_regs").collect())
    )
    want = sorted(
        map(
            tuple,
            sketch.hll_registers(df, "key", ["g"], b=8, portable=True).collect(),
        )
    )
    assert got == want


def test_streaming_cms_matches_batch(spark, tmp_path):
    """Streaming CMS cells (complete-mode sum aggregate) == batch cells on
    the same rows across micro-batches."""
    import pyspark.sql.functions as F
    from starchart_spark.operators import sketch

    df = spark.range(600).select((F.col("id") % 37).alias("key"))
    drop_dir = str(tmp_path / "cms_keys")
    df.repartition(4, "key").write.parquet(drop_dir)

    src = (
        spark.readStream.schema("key long")
        .option("maxFilesPerTrigger", 1)
        .parquet(drop_dir)
    )
    q = (
        stream.streaming_cms(src, "key", d=3, w=128, portable=True)
        .writeStream.format("memory")
        .queryName("cms_cells")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT row, cell, cnt FROM cms_cells").collect())
    )
    want = sorted(
        map(tuple, sketch.cms_build(df, "key", d=3, w=128, portable=True).collect())
    )
    assert got == want


def test_streaming_aimd_matches_batch(spark, tmp_path):
    """Streaming AIMD controller (foreachBatch + carried prior dim) ==
    one-shot batch fold over the same attempt log — the epoch-chaining
    property run through a real stream, per-host order monotone across
    micro-batches (the arrival-order contract)."""
    import os
    import time as _time

    import pyspark.sql.functions as F
    from starchart_spark.operators import aimd

    rows = [
        ("a", t, t % 3 != 0) for t in range(1, 13)
    ] + [("b", t, True) for t in range(1, 7)] + [
        ("c", t, False) for t in range(1, 9)
    ]
    df = spark.createDataFrame(rows, "hostname string, ts long, ok boolean")
    drop = str(tmp_path / "attempts")
    # three epoch files written in ts order (FileStreamSource processes in
    # discovery order; distinct mtimes pin it)
    for lo, hi in ((1, 5), (5, 9), (9, 13)):
        df.filter((F.col("ts") >= lo) & (F.col("ts") < hi)).coalesce(
            1
        ).write.mode("append").parquet(drop)
        _time.sleep(1.1)

    src = (
        spark.readStream.schema("hostname string, ts long, ok boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(drop)
    )
    state = str(tmp_path / "state")
    q = stream.streaming_aimd_controller(
        src, state, str(tmp_path / "ck"), r0_mu=1_000, add_mu=50
    )
    q.awaitTermination(120)

    got = {
        r["hostname"]: r["rate_mu"]
        for r in spark.read.parquet(os.path.join(state, "current")).collect()
    }
    want = {
        r["hostname"]: r["rate_mu"]
        for r in aimd.aimd_rates(df, r0_mu=1_000, add_mu=50).collect()
    }
    assert got == want


def test_streaming_aimd_replay_guard(spark, tmp_path):
    """Re-delivering a folded batch_id is a no-op: the AIMD fold is not
    idempotent, foreachBatch is at-least-once, so the stamp must gate."""
    import os

    from starchart_spark.streaming.stream import aimd_fold_factory

    state = str(tmp_path / "state")
    fold = aimd_fold_factory(state, r0_mu=1_000, add_mu=50)
    batch = spark.createDataFrame(
        [("a", 1, True), ("a", 2, True)], "hostname string, ts long, ok boolean"
    )
    fold(batch, 0)
    first = spark.read.parquet(os.path.join(state, "current")).collect()
    assert {r["hostname"]: r["rate_mu"] for r in first} == {"a": 1_100}
    fold(batch, 0)  # replay: must NOT fold to 1_200
    again = spark.read.parquet(os.path.join(state, "current")).collect()
    assert {r["hostname"]: r["rate_mu"] for r in again} == {"a": 1_100}
    fold(batch, 1)  # a genuinely new batch folds on top
    nxt = spark.read.parquet(os.path.join(state, "current")).collect()
    assert {r["hostname"]: r["rate_mu"] for r in nxt} == {"a": 1_200}
