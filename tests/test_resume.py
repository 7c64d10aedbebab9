"""Checkpoint/resume (P8, north_rule): kill the crawl after batch k, reopen
the warehouse, continue — final state and crawl order must be identical to
an uninterrupted run."""

from __future__ import annotations

import pytest

from starchart_spark.crawl.corpus import CorpusSpec, make_corpus
from starchart_spark.crawl.engine import CrawlEngine, CrawlSettings
from starchart_spark.testing import corpus_to_spark

SPEC = CorpusSpec(n_forges=2, repos_per_forge=40, page_size=20)


def _collect(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def dfs(spark):
    return corpus_to_spark(spark, make_corpus(SPEC))


def _fresh_engine(spark, path):
    return CrawlEngine(spark, str(path), CrawlSettings(host_buckets=4))


def test_resume_equals_uninterrupted(spark, tmp_path_factory, dfs):
    # reference run, no interruption
    eng_a = _fresh_engine(spark, tmp_path_factory.mktemp("wh_a"))
    eng_a.init_state(dfs["seed_forges"], dfs["consent"])
    eng_a.run(dfs["documents"])

    # interrupted run: stop after 1 batch ("kill"), then reopen fresh objects
    wh_b = tmp_path_factory.mktemp("wh_b")
    eng_b1 = _fresh_engine(spark, wh_b)
    eng_b1.init_state(dfs["seed_forges"], dfs["consent"])
    eng_b1.run(dfs["documents"], max_batches=1)
    del eng_b1
    eng_b2 = _fresh_engine(spark, wh_b)  # resume = reopen warehouse
    eng_b2.run(dfs["documents"])

    cols_u = ["hostname", "username", "html_link"]
    cols_r = ["hostname", "owner", "name", "html_url"]
    assert _collect(eng_a.users.read(spark), cols_u) == _collect(
        eng_b2.users.read(spark), cols_u
    )
    assert _collect(eng_a.repositories.read(spark), cols_r) == _collect(
        eng_b2.repositories.read(spark), cols_r
    )
    order_cols = ["seq", "doc_id"]
    assert _collect(eng_a.crawl_order(), order_cols) == _collect(
        eng_b2.crawl_order(), order_cols
    )


def test_resume_after_partial_batch_rollback(spark, tmp_path_factory, dfs):
    """A crash mid-batch (tables committed, state snapshot not) must be
    absorbed: merge-insert idempotency makes the re-run of that batch a
    no-op, same observable end state (SURVEY.md P8)."""
    wh = tmp_path_factory.mktemp("wh_c")
    eng = _fresh_engine(spark, wh)
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    eng.run(dfs["documents"], max_batches=2)
    # simulate crash between entity-merge and state commit: roll the state
    # table back one snapshot, keeping the entity merges of batch 2
    snaps = eng.state.snapshots()
    eng.state.rollback(snaps[-2].snapshot_id)
    eng2 = _fresh_engine(spark, wh)
    eng2.run(dfs["documents"])  # re-runs batch 2, then continues
    want_users = SPEC.n_forges  # 'bot' per forge
    want_repos = SPEC.n_forges * SPEC.repos_per_forge
    assert eng2.users.read(spark).count() == want_users
    assert eng2.repositories.read(spark).count() == want_repos
    # exactly-once visit log (ADVICE r3 #2): the resume guard rolled the
    # tables that were ahead of the state commit back one batch, so the
    # re-run of the partial batch appends its visit/lineage rows ONCE —
    # no duplicate (forge, page, idx) rows survive the crash-replay
    vl = eng2.visit_log.read(spark)
    assert (
        vl.count()
        == vl.select("forge_id", "page", "idx_in_page").distinct().count()
    )
    lin = eng2.lineage.read(spark)
    assert (
        lin.count()
        == lin.select("batch_id", "partition_id").distinct().count()
    )
