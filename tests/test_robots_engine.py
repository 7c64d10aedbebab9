"""Engine-level robots.txt enforcement (north rule "robots.txt honored").

The reference has no robots concept (its opt-in model is DNS TXT consent,
src/verify.rs:44-70); the north rule mandates robots alongside it, so the
semantics here are the engine's own, documented in CrawlEngine.init_state:

- crawl-delay raises the persisted effective_rate_ms (most-conservative),
- a disallowed TOPIC fetch is skipped (never slotted, fetched or logged)
  while its repo row still merges — with only the topics it may see,
- a disallowed PAGE fetch drains the host like the empty-page sentinel
  (forge row exists, zero fetches, zero entities),
- every denial is accounted in the lineage column ``blocked_by_robots``,
- an allow-everything robots file changes NOTHING (gate-plumbing parity).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from starchart_spark.crawl.corpus import CorpusSpec, make_corpus
from starchart_spark.crawl.engine import CrawlEngine, CrawlSettings
from starchart_spark.testing import corpus_to_spark

H1, H2 = "forge-0001.test", "forge-0002.test"
BLOCKED_TOPIC_URL = f"https://{H1}/api/v1/repos/bot/repository_7/topics"

ROBOTS = [
    # h1: one repo's topics endpoint disallowed + crawl-delay 3 s
    (H1, "User-agent: starchart\nDisallow: /api/v1/repos/bot/repository_7/\nCrawl-delay: 3\n"),
    # h2: the whole API surface disallowed — search pages included
    (H2, "User-agent: *\nDisallow: /api/\n"),
]


@pytest.fixture(scope="module")
def robots_crawl(spark, tmp_path_factory):
    spec = CorpusSpec(n_forges=2, repos_per_forge=40, page_size=20)
    corpus = make_corpus(spec)
    dfs = corpus_to_spark(spark, corpus)
    eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("wh_robots")),
        CrawlSettings(items_per_api_call=20, host_buckets=8),
    )
    robots = spark.createDataFrame(ROBOTS, ["hostname", "robots_txt"])
    eng.init_state(dfs["seed_forges"], dfs["consent"], robots=robots)
    stats = eng.run(dfs["documents"])
    return spec, corpus, dfs, eng, stats


def test_blocked_host_drains_without_fetching(robots_crawl):
    _, _, _, eng, _ = robots_crawl
    # the forge is still known (robots restricts fetching, not existence)
    hosts = {r["hostname"] for r in eng.forges.read(eng.spark).collect()}
    assert hosts == {f"https://{H1}/", f"https://{H2}/"}
    # but nothing of h2 was ever fetched, logged, or merged
    log = eng.visit_log.read(eng.spark)
    assert log.filter(F.col("hostname") == H2).count() == 0
    # entity tables key on the forge URL, not the bare host
    u2 = f"https://{H2}/"
    assert eng.users.read(eng.spark).filter(F.col("hostname") == u2).count() == 0
    assert (
        eng.repositories.read(eng.spark).filter(F.col("hostname") == u2).count() == 0
    )
    assert eng.users.read(eng.spark).count() == 1  # h1's bot only
    st = {r["hostname"]: r for r in eng.state.read(eng.spark).collect()}
    assert st[H2]["active"] is False
    assert st[H2]["next_page"] == 1  # never progressed


def test_blocked_topic_skipped_repo_kept(robots_crawl):
    spec, _, _, eng, _ = robots_crawl
    repos = eng.repositories.read(eng.spark).filter(
        F.col("hostname") == f"https://{H1}/"
    )
    assert repos.count() == spec.repos_per_forge  # repo row still merges
    tags = {
        r["name"]: r["tags"]
        for r in repos.select("name", "tags").collect()
    }
    assert not tags["repository_7"]  # topics fetch denied -> no tags
    for name, t in tags.items():
        if name != "repository_7":
            assert t == ["testing"]
    # the denied URL never hit the wire (visit log is fetch evidence)
    log = eng.visit_log.read(eng.spark)
    assert log.filter(F.col("doc_id") == BLOCKED_TOPIC_URL).count() == 0
    # h1 fetched everything else: pages+sentinel (3) + 39 allowed topics
    assert log.filter(F.col("hostname") == H1).count() == 3 + spec.repos_per_forge - 1


def test_lineage_accounts_denials(robots_crawl):
    _, _, _, eng, _ = robots_crawl
    lin = eng.lineage.read(eng.spark)
    tot = lin.agg(
        F.sum("blocked_by_robots").alias("b"), F.sum("fetched").alias("f")
    ).collect()[0]
    # 1 blocked page (h2, batch 1) + 1 blocked topic (h1 repository_7)
    assert tot["b"] == 2
    assert tot["f"] == 3 + 40 - 1  # h1 only


def test_crawl_delay_raises_persisted_rate(robots_crawl):
    _, _, _, eng, _ = robots_crawl
    st = {r["hostname"]: r for r in eng.state.read(eng.spark).collect()}
    assert st[H1]["effective_rate_ms"] == 3000  # greatest(2000 default, 3000)
    assert st[H2]["effective_rate_ms"] == 2000  # no crawl-delay


def test_rerun_idempotent_under_robots(robots_crawl):
    _, _, dfs, eng, _ = robots_crawl
    before_u = eng.users.read(eng.spark).count()
    before_r = eng.repositories.read(eng.spark).count()
    robots = eng.spark.createDataFrame(ROBOTS, ["hostname", "robots_txt"])
    eng.init_state(dfs["seed_forges"], dfs["consent"], robots=robots)
    eng.run(dfs["documents"])
    assert eng.users.read(eng.spark).count() == before_u
    assert eng.repositories.read(eng.spark).count() == before_r


def test_robots_fetched_over_wire_and_enforced(spark, tmp_path):
    """Transport-mode e2e: robots.txt is fetched from the server itself
    (fetcher.fetch_robots), a 404 robots means unrestricted, and a
    disallowed topics URL NEVER reaches the wire — asserted on the
    server's own request log, the strongest possible evidence."""
    import http.server
    import json as _json
    import threading
    import urllib.parse

    from starchart_spark.crawl import fetcher

    spec = CorpusSpec(n_forges=2, repos_per_forge=10, page_size=5)
    dfs = corpus_to_spark(spark, make_corpus(spec))

    doc_map = {
        r["doc_id"]: [s.asDict() for s in r["spans"]]
        for r in dfs["documents"].collect()
    }
    robots_body = "User-agent: *\nDisallow: /api/v1/repos/bot/repository_3/\n"
    # h1 serves a robots file; h2 has none (404 -> unrestricted)
    doc_map[f"https://{H1}/robots.txt"] = [
        {"kind": "text", "text": robots_body, "media_ref": None, "offset": 0}
    ]
    requested = []

    class _H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            q = urllib.parse.urlparse(self.path).query
            url = urllib.parse.parse_qs(q).get("url", [""])[0]
            requested.append(url)
            spans = doc_map.get(url)
            if spans is None:
                self.send_response(404)
                self.end_headers()
                return
            body = _json.dumps(spans).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]

    http_t = fetcher.HttpTransport(
        "me.example:3000", parser=lambda _u, body: __import__("json").loads(body)
    )
    base = f"http://127.0.0.1:{port}/fetch?url="

    def transport(url):
        return http_t(base + urllib.parse.quote(url, safe=""))

    eng = CrawlEngine(
        spark,
        str(tmp_path / "wh_wire"),
        CrawlSettings(host_buckets=4, items_per_api_call=5, rate_ms=1,
                      transport=transport),
    )
    hosts = spark.createDataFrame([(H1,), (H2,)], ["hostname"])
    robots = fetcher.fetch_robots(hosts, transport)
    eng.init_state(dfs["seed_forges"], dfs["consent"], robots=robots)
    eng.run()
    srv.shutdown()

    blocked_url = f"https://{H1}/api/v1/repos/bot/repository_3/topics"
    # robots fetched exactly once per host (incl. the 404 host), and the
    # denied URL never left the engine
    assert requested.count(f"https://{H1}/robots.txt") == 1
    assert requested.count(f"https://{H2}/robots.txt") == 1
    assert blocked_url not in requested
    repos = eng.repositories.read(spark)
    assert repos.count() == 2 * spec.repos_per_forge  # h2 unrestricted
    tags = {
        (r["hostname"], r["name"]): r["tags"]
        for r in repos.select("hostname", "name", "tags").collect()
    }
    assert not tags[(f"https://{H1}/", "repository_3")]
    assert tags[(f"https://{H2}/", "repository_3")] == ["testing"]
    b = eng.lineage.read(spark).agg(F.sum("blocked_by_robots")).collect()[0][0]
    assert b == 1


def test_allow_all_robots_is_a_noop(spark, tmp_path_factory):
    """Gate-plumbing parity: an allow-everything robots file must reproduce
    the robots-free crawl exactly (entities, visit log, lineage)."""
    spec = CorpusSpec(n_forges=2, repos_per_forge=20, page_size=20)
    corpus = make_corpus(spec)
    dfs = corpus_to_spark(spark, corpus)

    def crawl(robots):
        eng = CrawlEngine(
            spark,
            str(tmp_path_factory.mktemp("wh_parity")),
            CrawlSettings(items_per_api_call=20, host_buckets=8),
        )
        eng.init_state(dfs["seed_forges"], dfs["consent"], robots=robots)
        eng.run(dfs["documents"])
        return eng

    base = crawl(None)
    permissive = crawl(
        spark.createDataFrame(
            [(H1, "User-agent: *\nAllow: /\nCrawl-delay: 0.5\n")],
            ["hostname", "robots_txt"],
        )
    )  # delay 500ms < default 2000 -> greatest() keeps 2000

    def rows(eng, tbl, cols):
        return sorted(
            tuple(r[c] for c in cols)
            for r in getattr(eng, tbl).read(eng.spark).select(*cols).collect()
        )

    for tbl, cols in [
        ("users", ["hostname", "username"]),
        ("repositories", ["hostname", "owner", "name"]),
        ("visit_log", ["hostname", "page", "idx_in_page", "doc_id"]),
    ]:
        assert rows(base, tbl, cols) == rows(permissive, tbl, cols)
    b = permissive.lineage.read(spark).agg(F.sum("blocked_by_robots")).collect()[0][0]
    assert b == 0
    st = {r["hostname"]: r for r in permissive.state.read(spark).collect()}
    assert st[H1]["effective_rate_ms"] == 2000
