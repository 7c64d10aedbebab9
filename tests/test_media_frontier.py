"""Media-frontier discovery (discover_media): the interleaved media spans
enter the URL frontier through the SAME unified seen pass as users/repos —
first sightings land in media_assets with media_discovered lineage, re-crawls
re-discover nothing, and the default mode stays byte-identical."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from starchart_spark.crawl.corpus import CorpusSpec, make_corpus
from starchart_spark.crawl.engine import CrawlEngine, CrawlSettings
from starchart_spark.testing import corpus_to_spark


def _expected_avatars(corpus):
    """Distinct media refs across all page docs of the corpus."""
    refs = set()
    for spans in corpus.documents["spans"]:
        for s in spans:
            if s["kind"] == "media" and s["media_ref"]:
                refs.add(s["media_ref"])
    return refs


@pytest.fixture(scope="module")
def media_crawl(spark, tmp_path_factory):
    spec = CorpusSpec(n_forges=2, repos_per_forge=30, page_size=10)
    corpus = make_corpus(spec)
    dfs = corpus_to_spark(spark, corpus)
    eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("media_wh")),
        CrawlSettings(items_per_api_call=10, host_buckets=8, discover_media=True),
    )
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    stats = eng.run(dfs["documents"], batch_time_s=1_000)
    return spec, corpus, dfs, eng, stats


def test_media_assets_exact(media_crawl):
    _, corpus, _, eng, _ = media_crawl
    got = {
        (r["media_ref"], r["hostname"], r["media_type"])
        for r in eng.media_assets.read(eng.spark).collect()
    }
    want = {
        (ref, ref.split("://", 1)[1].split("/", 1)[0].lower(), "image")
        for ref in _expected_avatars(corpus)
    }
    assert got == want


def test_media_in_url_seen_and_lineage(media_crawl):
    _, corpus, _, eng, _ = media_crawl
    n = len(_expected_avatars(corpus))
    seen_media = eng.url_seen.read(eng.spark).filter(F.col("key_kind") == "media")
    assert seen_media.count() == n
    lin = eng.lineage.read(eng.spark)
    assert lin.agg(F.sum("media_discovered")).collect()[0][0] == n


def test_entities_exact_with_media_on(media_crawl):
    """Media discovery must not perturb the reference-parity outputs."""
    _, _, dfs, eng, _ = media_crawl
    assert (
        eng.users.read(eng.spark).count() == dfs["golden_users"].count()
    )
    assert (
        eng.repositories.read(eng.spark).count()
        == dfs["golden_repositories"].count()
    )


def test_recrawl_discovers_nothing_new(media_crawl, spark):
    spec, corpus, dfs, eng, _ = media_crawl
    before = eng.media_assets.read(spark).count()
    lin_before = (
        eng.lineage.read(spark).agg(F.sum("media_discovered")).collect()[0][0]
    )
    # TTL reactivation + second cycle: every media ref is already seen
    assert eng.reactivate_due(now_s=1_000 + 432_000) == spec.n_forges
    eng.run(dfs["documents"], batch_time_s=1_000 + 432_000 + 1)
    assert eng.media_assets.read(spark).count() == before
    lin_after = (
        eng.lineage.read(spark).agg(F.sum("media_discovered")).collect()[0][0]
    )
    assert lin_after == lin_before  # zero new discoveries in cycle 2


def test_cross_host_media_keys_use_media_host(spark, tmp_path):
    """Avatars on a CDN must key by the CDN host, not the forge host."""
    spec = CorpusSpec(n_forges=1, repos_per_forge=10, page_size=5)
    dfs = corpus_to_spark(spark, make_corpus(spec))
    cdn_docs = dfs["documents"].withColumn(
        "spans",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                F.when(
                    s["media_ref"].isNotNull(),
                    F.concat(
                        F.lit("https://CDN.example.org/"),
                        F.regexp_extract(s["media_ref"], r"([^/]+)$", 1),
                    ),
                ).alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ),
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "wh"),
        CrawlSettings(items_per_api_call=5, host_buckets=8, discover_media=True),
    )
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    eng.run(cdn_docs)
    hosts = {
        r["hostname"] for r in eng.media_assets.read(spark).collect()
    }
    assert hosts == {"cdn.example.org"}  # lowercased media-URL host
    # forge-host keys unaffected
    assert (
        eng.url_seen.read(spark)
        .filter((F.col("key_kind") == "media") & (F.col("hostname") != "cdn.example.org"))
        .count()
        == 0
    )


def test_default_mode_has_no_media_surface(spark, tmp_path):
    spec = CorpusSpec(n_forges=1, repos_per_forge=10, page_size=5)
    dfs = corpus_to_spark(spark, make_corpus(spec))
    eng = CrawlEngine(
        spark, str(tmp_path / "wh2"), CrawlSettings(items_per_api_call=5, host_buckets=8)
    )
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    eng.run(dfs["documents"])
    assert eng.media_assets.current_snapshot() is None  # table never written
    assert (
        eng.url_seen.read(spark).filter(F.col("key_kind") == "media").count() == 0
    )
    lin = eng.lineage.read(spark)
    assert lin.agg(F.sum("media_discovered")).collect()[0][0] == 0
