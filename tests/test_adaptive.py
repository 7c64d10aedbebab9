"""Adaptive crawl mode: transport-fault retry + AIMD rate control wired
into the engine (CrawlSettings.adaptive, operators/aimd.py).

Three contracts:

1. **Fault tolerance never changes WHAT is crawled.** With a transport
   that fails every URL's first attempt (timeout-shaped exception), the
   adaptive engine retries through the pending-carryover machinery and
   converges to EXACTLY the documents-join end state — users, repos incl.
   tags, url_seen, and the golden crawl order — with every URL
   successfully fetched exactly once and every failure recorded in the
   fetch_log.

2. **adapt_rates() is the AIMD fold, exactly.** The persisted controller
   state replays bit-for-bit against a pure-Python fold of the fetch_log,
   the frontier re-pace is greatest(base, delay(applied)), and a second
   fold with no new attempts is a no-op (watermark idempotency).

3. **Epochs chain.** Cycle 1 (faulty) then cycle 2 (healthy) folded
   separately equals one fold over the concatenated log — the engine-level
   version of the operator's split-fold identity — and a recovering host's
   pace returns toward (never past) its static base.
"""

from __future__ import annotations

import os

from starchart_spark.crawl.corpus import CorpusSpec, make_corpus
from starchart_spark.crawl.engine import CrawlEngine, CrawlSettings
from starchart_spark.operators.aimd import AimdParams
from starchart_spark.testing import corpus_to_spark


def make_flaky_transport(doc_map, marker_dir, log_path):
    """Fails the FIRST attempt of every URL (connection-reset-shaped),
    succeeds afterwards. Marker files make the per-URL attempt count
    durable across executor processes; the log records successful fetches
    (for the exactly-once assertion)."""

    def _t(url):
        import hashlib
        import os as _os

        mark = _os.path.join(
            marker_dir, hashlib.md5(url.encode()).hexdigest()
        )
        if not _os.path.exists(mark):
            open(mark, "w").close()
            raise ConnectionResetError(f"injected fault: {url}")
        with open(log_path, "a") as f:
            f.write(url + "\n")
        return doc_map.get(url)

    return _t


def _replay_aimd(steps_by_host, p, prior=None):
    """Pure-Python AIMD fold oracle: steps are (ts, ok) sorted by ts."""
    out = {}
    for host, steps in steps_by_host.items():
        rate = (prior or {}).get(host, p.r0_mu)
        for _, ok in sorted(steps):
            rate = rate + p.add_mu if ok else rate >> 1
        out[host] = rate
    return out


def _corpus(spark):
    spec = CorpusSpec(n_forges=3, repos_per_forge=15, page_size=10)
    dfs = corpus_to_spark(spark, make_corpus(spec))
    doc_map = {
        r["doc_id"]: [s.asDict() for s in r["spans"]]
        for r in dfs["documents"].collect()
    }
    return dfs, doc_map


def test_flaky_transport_equals_join_mode(spark, tmp_path):
    dfs, doc_map = _corpus(spark)
    settings = dict(host_buckets=4, items_per_api_call=10, rate_ms=1)

    eng_a = CrawlEngine(spark, str(tmp_path / "wh_join"), CrawlSettings(**settings))
    eng_a.init_state(dfs["seed_forges"], dfs["consent"])
    eng_a.run(dfs["documents"])

    marks = tmp_path / "marks"
    marks.mkdir()
    log = str(tmp_path / "ok_fetches.log")
    open(log, "w").close()
    eng_b = CrawlEngine(
        spark,
        str(tmp_path / "wh_flaky"),
        CrawlSettings(
            **settings,
            transport=make_flaky_transport(doc_map, str(marks), log),
            adaptive=AimdParams(),
        ),
    )
    eng_b.init_state(dfs["seed_forges"], dfs["consent"])
    eng_b.run()

    # end-state equality, incl. tags (carried bodies arrived intact)
    def repos(eng):
        return sorted(
            (r["hostname"], r["owner"], r["name"], r["html_url"],
             tuple(r["tags"] or []))
            for r in eng.repositories.read(spark)
            .select("hostname", "owner", "name", "html_url", "tags").collect()
        )

    def users(eng):
        return sorted(
            tuple(r) for r in eng.users.read(spark)
            .select("hostname", "username", "html_link").collect()
        )

    def seen(eng):
        return sorted(
            tuple(r) for r in eng.url_seen.read(spark)
            .select("key_kind", "hostname", "key1", "key2").collect()
        )

    def order(eng):
        return sorted(
            tuple(r)
            for r in eng.crawl_order().select("seq", "doc_id").collect()
        )

    assert repos(eng_a) == repos(eng_b)
    assert users(eng_a) == users(eng_b)
    assert seen(eng_a) == seen(eng_b)
    assert order(eng_a) == order(eng_b)

    # every URL fetched successfully exactly once, despite every URL
    # failing its first attempt
    ok_urls = [ln.strip() for ln in open(log) if ln.strip()]
    assert len(ok_urls) == len(set(ok_urls)), "a URL was re-fetched after success"
    # visit log is exactly-once and matches the successful wire hits
    vis = [
        r["doc_id"]
        for r in eng_b.visit_log.read(spark).select("doc_id").collect()
    ]
    assert sorted(vis) == sorted(ok_urls)

    # fetch_log: one failure + one success per attempted URL
    flog = eng_b.fetch_log.read(spark).collect()
    fails = [r for r in flog if not r["ok"]]
    oks = [r for r in flog if r["ok"]]
    assert len(oks) == len(ok_urls)
    assert len(fails) == len(ok_urls)  # every URL failed exactly once

    # pending drained; frontier fully crawled
    assert eng_b.pending.read(spark).count() == 0
    st = eng_b.state.read(spark).collect()
    assert all(not r["active"] for r in st)


def test_adapt_rates_exact_fold_and_repace(spark, tmp_path):
    dfs, doc_map = _corpus(spark)
    p = AimdParams(r0_mu=1_000, add_mu=50, min_mu=10, max_mu=10_000)
    marks = tmp_path / "marks"
    marks.mkdir()
    log = str(tmp_path / "ok.log")
    open(log, "w").close()
    eng = CrawlEngine(
        spark,
        str(tmp_path / "wh"),
        CrawlSettings(
            host_buckets=4, items_per_api_call=10, rate_ms=1, ttl_s=10,
            transport=make_flaky_transport(doc_map, str(marks), log),
            adaptive=p,
        ),
    )
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    eng.run(batch_time_s=1_000)

    res = eng.adapt_rates()
    assert res["hosts_repaced"] > 0

    # exact replay of the fold from the logged attempts
    flog = eng.fetch_log.read(spark).collect()
    steps = {}
    for r in flog:
        steps.setdefault(r["hostname"], []).append((r["ts"], r["ok"]))
    expect = _replay_aimd(steps, p)
    got = {
        r["hostname"]: (r["base_rate_ms"], r["rate_mu"])
        for r in eng.aimd_state.read(spark).collect()
    }
    assert set(got) == set(expect)
    for h, mu in expect.items():
        assert got[h][1] == mu, h
        assert got[h][0] == 1  # base = static rate_ms captured at first fold

    # frontier re-pace: greatest(base, 1e6 div clamp(mu))
    st = {r["hostname"]: r["effective_rate_ms"]
          for r in eng.state.read(spark).collect()}
    for h, mu in expect.items():
        applied = min(max(mu, p.min_mu), p.max_mu)
        assert st[h] == max(1, 1_000_000 // applied), h

    # watermark idempotency: nothing new to fold → no-op
    before = sorted(map(tuple, eng.aimd_state.read(spark).collect()))
    res2 = eng.adapt_rates()
    assert res2["hosts_repaced"] == 0
    assert sorted(map(tuple, eng.aimd_state.read(spark).collect())) == before


def test_epoch_chaining_recovery(spark, tmp_path):
    """Cycle 1 faulty → slowed; cycle 2 healthy → additive recovery; the
    two-epoch chain equals one fold of the concatenated log."""
    dfs, doc_map = _corpus(spark)
    p = AimdParams(r0_mu=1_000, add_mu=50, min_mu=10, max_mu=10_000)
    marks = tmp_path / "marks"
    marks.mkdir()
    log = str(tmp_path / "ok.log")
    open(log, "w").close()
    eng = CrawlEngine(
        spark,
        str(tmp_path / "wh"),
        CrawlSettings(
            host_buckets=4, items_per_api_call=10, rate_ms=1, ttl_s=10,
            transport=make_flaky_transport(doc_map, str(marks), log),
            adaptive=p,
        ),
    )
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    eng.run(batch_time_s=1_000)
    eng.adapt_rates()
    slowed = {r["hostname"]: r["effective_rate_ms"]
              for r in eng.state.read(spark).collect()}
    assert all(v > 1 for v in slowed.values())  # every host saw failures

    # cycle 2: markers persist → every URL now succeeds first try
    n = eng.reactivate_due(now_s=1_000 + 11)
    assert n > 0
    eng.run(batch_time_s=2_000)
    eng.adapt_rates()

    # chain identity: fold(all attempts) == the chained two-epoch state
    flog = eng.fetch_log.read(spark).collect()
    steps = {}
    for r in flog:
        steps.setdefault(r["hostname"], []).append((r["ts"], r["ok"]))
    expect = _replay_aimd(steps, p)
    got = {r["hostname"]: r["rate_mu"]
           for r in eng.aimd_state.read(spark).collect()}
    assert got == expect

    # recovery: pace moved back toward base, never past it
    recovered = {r["hostname"]: r["effective_rate_ms"]
                 for r in eng.state.read(spark).collect()}
    for h in recovered:
        assert recovered[h] <= slowed[h]
        assert recovered[h] >= 1  # never faster than the static base


def test_default_mode_schema_untouched(spark):
    """record_outcomes=False (the default everywhere outside adaptive
    mode) must not add the fetch_ok column — reference-parity plans stay
    byte-identical."""
    from starchart_spark.crawl import fetcher

    scheduled = spark.createDataFrame(
        [("h.test", "https://h.test/x", 0, 1)],
        "hostname string, doc_id string, slot_ms long, effective_rate_ms long",
    )
    out = fetcher.fetch_batch(scheduled, lambda url: None)
    assert "fetch_ok" not in out.columns
    out2 = fetcher.fetch_batch(scheduled, lambda url: None, record_outcomes=True)
    assert "fetch_ok" in out2.columns
    row = out2.collect()[0]
    assert row["fetch_ok"] is True and row["spans"] is None  # 404 ≠ fault


def test_adaptive_requires_transport(spark, tmp_path):
    import pytest

    dfs, _ = _corpus(spark)
    eng = CrawlEngine(
        spark, str(tmp_path / "wh"),
        CrawlSettings(host_buckets=4, adaptive=AimdParams()),
    )
    eng.init_state(dfs["seed_forges"], dfs["consent"])
    with pytest.raises(ValueError, match="requires a transport"):
        eng.run(dfs["documents"])


# marker-file hygiene: the flaky transport writes markers under tmp_path
# only; nothing leaks outside the test sandbox
def test_marker_isolation(tmp_path):
    assert os.path.isdir(str(tmp_path))
