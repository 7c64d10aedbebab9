"""Entity-confirm skip gate (the round-5 cadence lever after the unified
entity pass): when the entity⊆url_seen invariant holds — verified by ONE
isEmpty() job at run() start — every batch skips the entity confirm
anti-join (two entity-table scans + union + NULL-safe anti-join). Asserted
here: bit-identical end state vs the conservative join path, the skip is
actually engaged on a pure warehouse, and foreign entities (tar-import
shape: merged without url_seen keys) disable the skip AND are still never
double-inserted when the crawl rediscovers them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from starchart_spark.crawl.corpus import CorpusSpec, make_corpus
from starchart_spark.crawl.engine import CrawlEngine, CrawlSettings
from starchart_spark.testing import corpus_to_spark

SPEC = CorpusSpec(n_forges=2, repos_per_forge=30, page_size=10)
SETTINGS = dict(host_buckets=4, items_per_api_call=10)


@pytest.fixture(scope="module")
def dfs(spark):
    return corpus_to_spark(spark, make_corpus(SPEC))


def _sorted(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def _crawl(spark, wh, dfs, force_join: bool):
    eng = CrawlEngine(spark, wh, CrawlSettings(**SETTINGS))
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    if force_join:
        eng._entity_confirm_skippable = lambda: False
    eng.run(dfs["documents"])
    return eng


def test_skip_engaged_and_end_state_identical(spark, tmp_path, dfs):
    skip_eng = _crawl(spark, str(tmp_path / "wh_skip"), dfs, force_join=False)
    join_eng = _crawl(spark, str(tmp_path / "wh_join"), dfs, force_join=True)

    # the gate actually engaged on the pure warehouse (and stayed engaged —
    # every batch commit maintains the invariant)
    assert skip_eng._entities_pure is True
    assert join_eng._entities_pure is False

    ucols = ["hostname", "username", "html_link", "imported"]
    rcols = ["hostname", "owner", "name", "html_url", "imported"]
    scols = ["key_kind", "hostname", "key1", "key2"]
    vcols = ["batch_id", "forge_id", "hostname", "page", "idx_in_page"]
    for tbl, cols in (
        ("users", ucols),
        ("repositories", rcols),
        ("url_seen", scols),
        ("visit_log", vcols),
    ):
        a = _sorted(getattr(skip_eng, tbl).read(spark), cols)
        b = _sorted(getattr(join_eng, tbl).read(spark), cols)
        assert a == b, f"{tbl} diverged between skip and join paths"


def test_foreign_entities_disable_skip_without_duplicates(spark, tmp_path, dfs):
    eng = CrawlEngine(spark, str(tmp_path / "wh_f"), CrawlSettings(**SETTINGS))
    eng.init_state(dfs["seed_forges"], dfs["consent"])

    # simulate a tar import: golden rows the crawl WILL rediscover, merged
    # as entities WITHOUT url_seen keys (interchange.import_into_engine
    # shape — and like it, this pins the gate off for the process)
    f_users = dfs["golden_users"].limit(1)
    f_repos = dfs["golden_repositories"].limit(1)
    eng.users.merge_insert(spark, f_users, {"op": "import-tar"})
    eng.repositories.merge_insert(spark, f_repos, {"op": "import-tar"})
    eng._entities_pure = False

    eng.run(dfs["documents"])

    # run() re-verified and found the foreign rows → conservative join ran
    assert eng._entities_pure is False

    # no double inserts: every entity key is unique
    users = eng.users.read(spark)
    repos = eng.repositories.read(spark)
    assert users.count() == users.select("hostname", "username").distinct().count()
    assert repos.count() == repos.select("hostname", "owner", "name").distinct().count()

    # golden end state still exact (the import rows ARE golden rows)
    assert _sorted(users, ["hostname", "username"]) == _sorted(
        dfs["golden_users"], ["hostname", "username"]
    )
    assert _sorted(repos, ["hostname", "owner", "name"]) == _sorted(
        dfs["golden_repositories"], ["hostname", "owner", "name"]
    )

    # self-healing: the rediscovered foreign entities got their seen keys
    # (seen_rows derive from new_keys, not the confirm output), so the NEXT
    # run re-engages the skip
    assert eng._entity_confirm_skippable() is True


def test_import_into_engine_pins_gate_off(spark, tmp_path, dfs):
    from starchart_spark.crawl.interchange import import_into_engine

    eng = CrawlEngine(spark, str(tmp_path / "wh_i"), CrawlSettings(**SETTINGS))
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    eng._entities_pure = True
    f = eng.forges.read(spark).limit(0)
    import_into_engine(
        eng,
        {
            "forges": f,
            "users": dfs["golden_users"].limit(1),
            "repositories": dfs["golden_repositories"].limit(0),
        },
    )
    assert eng._entities_pure is False
