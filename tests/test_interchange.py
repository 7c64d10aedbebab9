"""Tar interchange (S9/S10/S11) + introducer bootstrap (P9/S12/S13/D10):
two warehouses actually exchanging data, with retention, idempotency and
imported=true lineage — the reference's federation plane
(federate/publiccodeyml/src/lib.rs:221-423, src/introduce.rs:38-251)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from starchart_spark.crawl import interchange, introduce
from starchart_spark.crawl.corpus import CorpusSpec, make_corpus
from starchart_spark.crawl.engine import CrawlEngine, CrawlSettings
from starchart_spark.testing import corpus_to_spark

SPEC = CorpusSpec(n_forges=2, repos_per_forge=20, page_size=20)


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    dfs = corpus_to_spark(spark, make_corpus(SPEC))
    eng = CrawlEngine(
        spark, str(tmp_path_factory.mktemp("wh_src")),
        CrawlSettings(host_buckets=4),
    )
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    eng.run(dfs["documents"], batch_time_s=100)
    return eng


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tar_publish_retention_and_latest(spark, crawled, tmp_path):
    root = str(tmp_path / "tree")
    pub = str(tmp_path / "pub")
    interchange.export_tree(
        crawled.forges.read(spark),
        crawled.users.read(spark),
        crawled.repositories.read(spark),
        root,
    )
    # one YAML per entity at <host>/<owner>/<repo>/publiccode.yml
    host = SPEC.host(1)
    assert os.path.exists(os.path.join(root, host, "instance.yml"))
    assert os.path.exists(os.path.join(root, host, "bot", "user.yml"))
    assert os.path.exists(
        os.path.join(root, host, "bot", "repository_0", "publiccode.yml")
    )
    for epoch in range(100, 800, 100):  # 7 publishes, retention 5
        interchange.publish_tar(root, pub, epoch)
    tars = sorted(os.listdir(pub))
    assert len(tars) == 5 and "100.tar" not in tars and "200.tar" not in tars
    assert interchange.latest_tar(pub).endswith("700.tar")


def test_tar_import_roundtrip_two_warehouses(spark, crawled, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("xchg")
    root, pub, work = str(tmp / "tree"), str(tmp / "pub"), str(tmp / "work")
    interchange.export_tree(
        crawled.forges.read(spark),
        crawled.users.read(spark),
        crawled.repositories.read(spark),
        root,
    )
    tar = interchange.publish_tar(root, pub, epoch=1000)

    eng_b = CrawlEngine(
        spark, str(tmp_path_factory.mktemp("wh_dst")), CrawlSettings(host_buckets=4)
    )
    parsed = interchange.import_tar(spark, tar, work)
    counts = interchange.import_into_engine(eng_b, parsed)
    assert counts["users"] == SPEC.n_forges  # 'bot' per forge
    assert counts["repositories"] == SPEC.n_forges * SPEC.repos_per_forge

    # entity tables equal, modulo the imported=true lineage flag (D9)
    ucols = ["hostname", "username", "html_link", "profile_photo"]
    assert _rows(eng_b.users.read(spark), ucols) == _rows(
        crawled.users.read(spark), ucols
    )
    rcols = ["hostname", "owner", "name", "description", "website", "html_url"]
    assert _rows(eng_b.repositories.read(spark), rcols) == _rows(
        crawled.repositories.read(spark), rcols
    )
    # tags survive the YAML round trip
    a = _rows(
        crawled.repositories.read(spark).withColumn("t", F.to_json("tags")),
        ["name", "t"],
    )
    b = _rows(
        eng_b.repositories.read(spark).withColumn("t", F.to_json("tags")),
        ["name", "t"],
    )
    assert a == b
    assert eng_b.users.read(spark).filter(~F.col("imported")).count() == 0
    assert eng_b.repositories.read(spark).filter(~F.col("imported")).count() == 0
    assert eng_b.forges.read(spark).filter(~F.col("imported")).count() == 0

    # idempotent replay: re-import inserts nothing (D9)
    again = interchange.import_into_engine(eng_b, interchange.import_tar(
        spark, tar, str(tmp / "work2")
    ))
    assert again == {"forges": 0, "users": 0, "repositories": 0}


def test_introducer_bootstrap_roundtrip(spark, crawled, tmp_path):
    my_forges = crawled.forges  # warehouse A's table, already crawled
    intro = introduce.introducers_table(str(tmp_path / "introducers"))
    mini = introduce.mini_index_table(str(tmp_path / "mini"))

    peer_url = "https://peer.starchart.test/"
    peer_forges = spark.createDataFrame(
        [
            ("https://h9.test/", "gitea", None, None, False, None),
            (SPEC.forge_url(1), "gitea", None, None, False, None),  # already known
            ("https://hx.test/", "gitea", None, None, True, "https://other/"),  # peer's own import: skipped
        ],
        crawled.forges.schema,
    )
    res = introduce.bootstrap(
        spark, my_forges, intro, mini,
        {peer_url: {"forges": peer_forges, "mini_index": "alpha beta"}},
    )
    # only the genuinely new, non-imported forge landed, with lineage
    assert res[peer_url]["forges_imported"] == 1
    row = my_forges.read(spark).filter(F.col("hostname") == "https://h9.test/").collect()[0]
    assert row["imported"] is True and row["starchart_instance"] == peer_url
    assert intro.read(spark).count() == 1
    assert mini.read(spark).collect()[0]["mini_index"] == "alpha beta"

    # idempotent replay; mini-index is delete-then-insert (S13)
    res2 = introduce.bootstrap(
        spark, my_forges, intro, mini,
        {peer_url: {"forges": peer_forges, "mini_index": "gamma"}},
    )
    assert res2[peer_url]["forges_imported"] == 0
    assert intro.read(spark).count() == 1
    rows = mini.read(spark).collect()
    assert len(rows) == 1 and rows[0]["mini_index"] == "gamma"