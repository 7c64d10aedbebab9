"""Federation + search semantics: publiccode.yml round-trip (N5/N6), import
lineage (D9), mini-index (A1, case-sensitive D7), query wildcarding (N9),
and result merge without dedup (§2.8)."""

import pytest
from pyspark.sql import functions as F

from starchart_spark import tables
from starchart_spark.crawl import federate, search
from starchart_spark.snapstore import SnapshotTable


@pytest.fixture(scope="module")
def repos(spark):
    rows = [
        ("https://h1.test/", "bot", "repository_0", "this repository is named repository_0",
         None, "https://h1.test/bot/repository_0", ["testing"], False),
        ("https://h1.test/", "bot", "starchart", "a spider", "https://docs.test",
         "https://h1.test/bot/starchart", ["testing", "Crawler"], False),
    ]
    return spark.createDataFrame(rows, tables.REPOSITORIES)


def test_publiccode_roundtrip(spark, repos):
    rendered = federate.render_publiccode(repos)
    back = federate.ingest_publiccode(rendered.select("hostname", "yaml"))
    cols = ["hostname", "owner", "name", "description", "website", "html_url", "tags"]
    a = sorted(tuple(r) for r in repos.select(*cols).collect())
    b = sorted(tuple(r) for r in back.select(*cols).collect())
    assert a == b
    # import lineage flag set (D9)
    assert back.filter(~F.col("imported")).count() == 0


def test_publiccode_yaml_shape(spark, repos):
    y = federate.render_publiccode(repos).filter(F.col("name") == "starchart").collect()[0]["yaml"]
    import yaml as pyyaml

    d = pyyaml.safe_load(y)
    assert d["publiccodeYmlVersion"] == "0.2"
    assert d["description"]["en"]["shortDescription"] == "a spider"
    assert d["description"]["en"]["documentation"] == "https://docs.test"
    assert d["landingURL"] == "https://docs.test"
    assert d["legal"]["repoOwner"] == "bot"
    assert d["intendedAudience"]["scope"] == ["testing", "Crawler"]


def test_mini_index_case_sensitive_and_ordered(spark):
    rows = [("https://h/", "bot", n, None, None, f"https://h/bot/{n}", None, False)
            for n in ["alpha-Beta", "beta gamma", "alpha"]]
    repos = spark.createDataFrame(rows, tables.REPOSITORIES).withColumn(
        "seq",
        F.when(F.col("name") == "alpha-Beta", 0)
        .when(F.col("name") == "beta gamma", 1)
        .otherwise(2),
    )
    words = federate.mini_index_words(repos, "seq")
    out = federate.export_mini_index(words)
    toks = out.split(" ")
    # case-sensitive: Beta and beta both present (db/db-core/src/tests.rs:154-170)
    assert "Beta" in toks and "beta" in toks
    assert sorted(set(toks)) == sorted(toks)  # unique words
    # insertion order: alpha-Beta's words first, then beta/gamma
    assert toks.index("alpha") < toks.index("beta") < toks.index("gamma")


def test_mini_index_deterministic_across_partitionings(spark):
    rows = [
        ("https://h/", "bot", f"word{i % 13} repo{i}", None, None,
         f"https://h/bot/r{i}", None, False)
        for i in range(60)
    ]
    repos = spark.createDataFrame(rows, tables.REPOSITORIES).withColumn(
        "seq", F.xxhash64("name")  # pure function of the data
    )
    out1 = federate.export_mini_index(
        federate.mini_index_words(repos.repartition(1), "seq")
    )
    out7 = federate.export_mini_index(
        federate.mini_index_words(repos.repartition(7), "seq")
    )
    assert out1 == out7


def test_mini_index_import_overwrites(spark, tmp_path):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("starchart_instance", T.StringType(), False),
            T.StructField("mini_index", T.StringType(), False),
        ]
    )
    store = SnapshotTable(str(tmp_path / "mini"), schema, ["starchart_instance"])
    federate.import_mini_index(store, spark, "https://peer.test/", "a b c")
    federate.import_mini_index(store, spark, "https://peer.test/", "d e")
    rows = store.read(spark).collect()
    assert len(rows) == 1 and rows[0]["mini_index"] == "d e"  # delete-then-insert


def test_wildcard(spark):
    assert search.wildcard("chart") == "*chart*"
    assert search.wildcard("chart*") == "chart*"  # explicit star preserved


def test_search_repositories(spark, repos):
    got = {r["name"] for r in search.search_repositories(repos, "spider").collect()}
    assert got == {"starchart"}
    got2 = {r["name"] for r in search.search_repositories(repos, "repository").collect()}
    assert got2 == {"repository_0"}
    got3 = {r["name"] for r in search.search_repositories(repos, "h1.test/bot").collect()}
    assert got3 == {"repository_0", "starchart"}  # matches html_url too


def test_federated_targets_and_merge(spark, repos):
    mi = spark.createDataFrame(
        [("https://peer1.test/", "starchart spider crawl"),
         ("https://peer2.test/", "unrelated words")],
        ["starchart_instance", "mini_index"],
    )
    peers = {r["starchart_instance"] for r in search.federated_targets(mi, "spider").collect()}
    assert peers == {"https://peer1.test/"}
    merged = search.merge_results(repos, repos)  # no dedup (src/search.rs:95-100)
    assert merged.count() == repos.count() * 2
