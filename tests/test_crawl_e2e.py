"""End-to-end crawl over the seeded corpus — the reference's own e2e
semantics (/root/reference/src/spider.rs:226-252: forge exists, user ``bot``
exists, all 100 repos exist with topic ``testing``), plus the stronger
golden assertions FIXTURES.md mandates: exact crawl order, exact URL-seen
membership, exact entity tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from starchart_spark.crawl.corpus import CorpusSpec, make_corpus
from starchart_spark.crawl.engine import CrawlEngine, CrawlSettings
from starchart_spark.testing import corpus_to_spark


@pytest.fixture(scope="module")
def crawl_result(spark, tmp_path_factory):
    spec = CorpusSpec(n_forges=3, repos_per_forge=100, page_size=20)
    corpus = make_corpus(spec)
    dfs = corpus_to_spark(spark, corpus)
    eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("warehouse")),
        CrawlSettings(items_per_api_call=20, host_buckets=8),
    )
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    stats = eng.run(dfs["documents"])
    return spec, corpus, dfs, eng, stats


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_batches_ran(crawl_result):
    spec, _, _, _, stats = crawl_result
    # 5 data pages + 1 sentinel page per host, hosts in parallel
    assert stats["batches"] == 6


def test_forge_exists(crawl_result):
    spec, _, _, eng, _ = crawl_result
    forges = eng.forges.read(eng.spark)
    hosts = {r["hostname"] for r in forges.collect()}
    assert hosts == {spec.forge_url(i) for i in range(1, spec.n_forges + 1)}


def test_users_exact(crawl_result):
    _, _, dfs, eng, _ = crawl_result
    cols = ["hostname", "username", "html_link", "profile_photo", "imported"]
    got = _sorted_rows(eng.users.read(eng.spark), cols)
    want = _sorted_rows(dfs["golden_users"], cols)
    assert got == want


def test_repositories_exact(crawl_result):
    _, _, dfs, eng, _ = crawl_result
    cols = ["hostname", "owner", "name", "description", "website", "html_url", "imported"]
    repos = eng.repositories.read(eng.spark)
    got = _sorted_rows(repos, cols)
    want = _sorted_rows(dfs["golden_repositories"], cols)
    assert got == want
    # topic 'testing' attached to every repo (J4 grouped join, D6 dedup)
    tagged = repos.filter(F.array_contains("tags", "testing")).count()
    assert tagged == repos.count()


def test_crawl_order_exact(crawl_result):
    """The pure-function visit order equals the reference's sequential order:
    (seed forge_id, page asc, in-page index), sentinel page included."""
    _, _, dfs, eng, _ = crawl_result
    cols = ["seq", "hostname", "page", "idx_in_page", "doc_id"]
    got = _sorted_rows(eng.crawl_order(), cols)
    want = _sorted_rows(dfs["golden_crawl_order"], cols)
    assert got == want


def test_url_seen_membership(crawl_result):
    spec, corpus, _, eng, _ = crawl_result
    seen = eng.url_seen.read(eng.spark)
    n_forges = spec.n_forges
    assert seen.filter(F.col("key_kind") == "forge").count() == n_forges
    assert seen.filter(F.col("key_kind") == "user").count() == n_forges  # bot per forge
    assert (
        seen.filter(F.col("key_kind") == "repo").count()
        == len(corpus.golden_repositories)
    )
    # membership keys are exact, not just counts
    repo_keys = {
        (r["hostname"], r["key1"], r["key2"])
        for r in seen.filter(F.col("key_kind") == "repo").collect()
    }
    want = {
        (r.hostname, r.name, r.owner)
        for r in corpus.golden_repositories.itertuples()
    }
    assert repo_keys == want


def test_idempotent_recrawl(crawl_result):
    """Re-running the whole crawl changes nothing (D9 import idempotency /
    exists-gate semantics): same users/repos, no new inserts."""
    _, _, dfs, eng, _ = crawl_result
    before_u = eng.users.read(eng.spark).count()
    before_r = eng.repositories.read(eng.spark).count()
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    eng.run(dfs["documents"])
    assert eng.users.read(eng.spark).count() == before_u
    assert eng.repositories.read(eng.spark).count() == before_r


def test_lineage_totals(crawl_result):
    spec, corpus, _, eng, _ = crawl_result
    lin = eng.lineage.read(eng.spark)
    tot = lin.agg(
        F.sum("fetched").alias("f"),
        F.sum("deferred_by_politeness").alias("d"),
    ).collect()[0]
    # first run fetched every golden-visited doc exactly once; the idempotent
    # re-crawl (test above, module-scoped fixture order) may add more — so
    # check against the first run's batches only
    first_run = lin.filter(F.col("batch_id") <= 6)
    f = first_run.agg(F.sum("fetched")).collect()[0][0]
    assert f == len(corpus.golden_crawl_order)
    assert tot["d"] == 0  # unbounded budget ⇒ nothing deferred
