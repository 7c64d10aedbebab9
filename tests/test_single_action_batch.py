"""Single-action micro-batch commit (VERDICT r2 'do this' #1).

The reference commits each page's users/repositories/seen rows in one sqlite
transaction (/root/reference/src/spider.rs:88-123). The engine's Spark
re-expression must not replace that with N jobs + driver count() sync
points: at 10^4 micro-batches the driver round-trips, not the data, become
the cadence floor. Contract asserted here: at default settings one
``_run_batch`` call triggers EXACTLY ONE write action and ZERO
count/collect/toPandas driver actions — every per-table row count and the
next batch's active-host count are observed metrics on the single write.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.readwriter import DataFrameWriter

from starchart_spark.crawl.corpus import CorpusSpec, make_corpus
from starchart_spark.crawl.engine import CrawlEngine, CrawlSettings
from starchart_spark.testing import corpus_to_spark

SPEC = CorpusSpec(n_forges=2, repos_per_forge=30, page_size=10)
SETTINGS = dict(host_buckets=4, items_per_api_call=10)


@pytest.fixture(scope="module")
def dfs(spark):
    return corpus_to_spark(spark, make_corpus(SPEC))


class ActionCounter:
    """Counts driver-triggered Spark actions via monkeypatched entry points."""

    def __init__(self, monkeypatch):
        self.writes = 0
        self.counts = 0
        self.collects = 0
        self.to_pandas = 0
        mp = monkeypatch

        orig_parquet = DataFrameWriter.parquet
        orig_count = DataFrame.count
        orig_collect = DataFrame.collect
        orig_topandas = DataFrame.toPandas
        counter = self

        def parquet(w, *a, **kw):
            counter.writes += 1
            return orig_parquet(w, *a, **kw)

        def count(df):
            counter.counts += 1
            return orig_count(df)

        def collect(df):
            counter.collects += 1
            return orig_collect(df)

        def toPandas(df):
            counter.to_pandas += 1
            return orig_topandas(df)

        mp.setattr(DataFrameWriter, "parquet", parquet)
        mp.setattr(DataFrame, "count", count)
        mp.setattr(DataFrame, "collect", collect)
        mp.setattr(DataFrame, "toPandas", toPandas)


def test_batch_is_one_action(spark, tmp_path, monkeypatch, dfs):
    eng = CrawlEngine(spark, str(tmp_path / "wh"), CrawlSettings(**SETTINGS))
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    docs = dfs["documents"].withColumn("host_bucket", eng._bucket("hostname"))

    # run batch 1 uninstrumented (startup paths — _ensure_bloom etc. — are
    # one-time, not per-batch), then assert the steady-state batch 2
    state = eng.state.read(spark).filter(F.col("active")).persist()
    assert state.count() > 0
    n_next = eng._run_batch(1, state, docs)
    state.unpersist()
    assert n_next > 0  # both forges still have pages

    state = eng.state.read(spark).filter(F.col("active")).persist()
    c = ActionCounter(monkeypatch)
    n_next2 = eng._run_batch(2, state, docs)
    state.unpersist()

    assert c.writes == 1, f"expected 1 write action per batch, saw {c.writes}"
    assert c.counts == 0, f"count() driver sync points in batch: {c.counts}"
    assert c.collects == 0, f"collect() driver sync points in batch: {c.collects}"
    assert c.to_pandas == 0
    assert n_next2 >= 0


def test_init_state_is_one_action(spark, tmp_path, monkeypatch, dfs):
    """init_state commits forges + forge seen keys + the initial state
    snapshot via ONE multi_commit write — no count()/collect() sync points
    (VERDICT r3 'do this' #8)."""
    eng = CrawlEngine(spark, str(tmp_path / "wh_init"), CrawlSettings(**SETTINGS))
    c = ActionCounter(monkeypatch)
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    assert c.writes == 1, f"expected 1 write action for init_state, saw {c.writes}"
    assert c.counts == 0 and c.collects == 0 and c.to_pandas == 0
    assert eng.forges.read(spark).count() == 2
    assert eng.url_seen.read(spark).count() == 2
    assert eng.state.read(spark).filter(F.col("active")).count() == 2


def test_import_into_engine_observed_merges(spark, tmp_path, monkeypatch, dfs):
    """import_into_engine: one observed-write action per table, zero
    count() jobs — inserted counts ride the snapshot summaries
    (VERDICT r3 'do this' #8)."""
    from starchart_spark import tables
    from starchart_spark.crawl.interchange import import_into_engine

    eng = CrawlEngine(spark, str(tmp_path / "wh_imp"), CrawlSettings(**SETTINGS))
    f = spark.createDataFrame(
        [("https://peer.test/", "gitea", None, None, True, None)], tables.FORGES
    )
    u = spark.createDataFrame(
        [("https://peer.test/", "bot", "https://peer.test/bot", None, True)],
        tables.USERS,
    )
    r = spark.createDataFrame(
        [("https://peer.test/", "bot", "r1", None, None,
          "https://peer.test/bot/r1", ["testing"], True)],
        tables.REPOSITORIES,
    )
    c = ActionCounter(monkeypatch)
    out = import_into_engine(eng, {"forges": f, "users": u, "repositories": r})
    assert c.writes == 3, f"expected 3 observed writes, saw {c.writes}"
    assert c.counts == 0 and c.collects == 0 and c.to_pandas == 0
    assert out == {"forges": 1, "users": 1, "repositories": 1}
    # idempotent re-import: merge-noops, still no count jobs
    out2 = import_into_engine(eng, {"forges": f, "users": u, "repositories": r})
    assert out2 == {"forges": 0, "users": 0, "repositories": 0}
    assert c.counts == 0 and c.collects == 0


def test_bloom_engaged_equals_exact_path(spark, tmp_path, dfs):
    """The bloom layer must never change an answer, only cost: a run with
    the filter FORCED on (bloom_min_keys=0) ends bit-identical to the
    default run (threshold-disengaged at this tiny scale), the filter
    table advances with the batches, and probing the final filters finds
    every committed seen key — the end-to-end no-false-negative guard that
    caught round 3's user-key KEY_SEP bug."""
    from starchart_spark.operators import bloom as bloom_mod

    eng_a = CrawlEngine(spark, str(tmp_path / "wh_bl_a"), CrawlSettings(**SETTINGS))
    eng_a.init_state(dfs["seed_forges"], dfs["consent"])
    eng_a.run(dfs["documents"])
    eng_b = CrawlEngine(
        spark, str(tmp_path / "wh_bl_b"),
        CrawlSettings(**SETTINGS, bloom_min_keys=0),
    )
    eng_b.init_state(dfs["seed_forges"], dfs["consent"])
    eng_b.run(dfs["documents"])

    for ta, tb, cols in (
        (eng_a.users, eng_b.users, ["hostname", "username", "html_link"]),
        (eng_a.repositories, eng_b.repositories,
         ["hostname", "owner", "name", "html_url"]),
        (eng_a.url_seen, eng_b.url_seen,
         ["key_kind", "hostname", "key1", "key2", "key_hash"]),
    ):
        a = sorted(tuple(r) for r in ta.read(spark).select(*cols).collect())
        b = sorted(tuple(r) for r in tb.read(spark).select(*cols).collect())
        assert a == b
    assert eng_b.bloom_state.current_snapshot().summary.get("batch_id") is not None
    seen = eng_b.url_seen.read(spark)
    probed = bloom_mod.probe_jvm(seen, eng_b.bloom_state.read(spark))
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_threshold_crossing_midrun(spark, tmp_path, dfs):
    """Crossing bloom_min_keys mid-run engages the filter layer: the
    driver-side counter (startup count + observed inserts) flips engaged,
    _ensure_bloom rebuilds once from url_seen, and from then on the filter
    table tracks every batch — ending current with the last batch and
    probing positive for every committed key."""
    from starchart_spark.operators import bloom as bloom_mod

    eng = CrawlEngine(
        spark, str(tmp_path / "wh_cross"),
        CrawlSettings(**SETTINGS, bloom_min_keys=30),
    )
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    eng.run(dfs["documents"])  # seen grows 2 → 64, crossing 30 mid-run
    assert eng._seen_total == eng.url_seen.read(spark).count()
    assert eng._seen_total > 30
    snap = eng.bloom_state.current_snapshot()
    assert snap is not None
    assert snap.summary.get("batch_id") == eng._last_batch_id()
    probed = bloom_mod.probe_jvm(
        eng.url_seen.read(spark), eng.bloom_state.read(spark)
    )
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_observed_active_count_matches_state(spark, tmp_path, dfs):
    """The observed n_active_next metric must equal what a count() of the
    committed state would return — the loop's stop condition depends on it."""
    eng = CrawlEngine(spark, str(tmp_path / "wh2"), CrawlSettings(**SETTINGS))
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    docs = dfs["documents"].withColumn("host_bucket", eng._bucket("hostname"))
    batch_id = 0
    while True:
        state = eng.state.read(spark).filter(F.col("active")).persist()
        true_n = state.count()
        if true_n == 0:
            state.unpersist()
            break
        batch_id += 1
        observed = eng._run_batch(batch_id, state, docs)
        state.unpersist()
        recount = eng.state.read(spark).filter(F.col("active")).count()
        assert observed == recount, (batch_id, observed, recount)
    assert batch_id >= 3  # drained after several pages


def test_reactivate_due_is_one_action(spark, tmp_path, monkeypatch, dfs):
    """P3 TTL sweep = ONE observed write, both when hosts are due (commit)
    and when none are (staged file discarded, no snapshot churn) — VERDICT
    r4 'do this' #8."""
    eng = CrawlEngine(spark, str(tmp_path / "wh_react"), CrawlSettings(**SETTINGS))
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    # drain both hosts fully (run() stamps last_crawl_on from the clock)
    eng.run(dfs["documents"], batch_time_s=10)
    assert eng.state.read(spark).filter(F.col("active")).count() == 0

    n_snaps_before = len(eng.state.snapshots())
    c = ActionCounter(monkeypatch)
    assert eng.reactivate_due(now_s=10) == 0  # nothing due yet
    assert c.writes == 1 and c.counts == 0 and c.collects == 0
    # nothing-due wake commits NO snapshot
    assert len(eng.state.snapshots()) == n_snaps_before

    c2 = ActionCounter(monkeypatch)
    assert eng.reactivate_due(now_s=10 + 432_000 + 1_000) == 2
    assert c2.writes == 1 and c2.counts == 0 and c2.collects == 0
    assert len(eng.state.snapshots()) == n_snaps_before + 1
    assert eng.state.read(spark).filter(F.col("active")).count() == 2
