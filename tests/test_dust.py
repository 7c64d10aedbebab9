"""DUST param-relevance mining (operators/dust.py).

Hand-built corpora pin the semantics: value-variant evidence, absent-variant
evidence, violation detection, the min_support floor, cross-host isolation,
and the mine→strip round trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from starchart_spark.operators import dust


def _obs(spark, rows):
    return spark.createDataFrame(rows, "url string, fingerprint long")


def _by_param(df):
    return {
        (r["hostname"], r["param"]): (
            r["n_groups"],
            r["evidence_groups"],
            r["violating_groups"],
            r["irrelevant"],
        )
        for r in df.collect()
    }


def test_irrelevant_param_by_value_and_absence(spark):
    # sid varies (1,2) and is absent once — content identical each time
    rows = [
        ("http://a.test/p?q=x&sid=1", 10),
        ("http://a.test/p?q=x&sid=2", 10),
        ("http://a.test/p?q=x", 10),
        ("http://a.test/p?q=y&sid=1", 20),
        ("http://a.test/p?q=y&sid=9", 20),
    ]
    got = _by_param(dust.param_relevance(_obs(spark, rows), min_support=2))
    # sid: two residual groups (q=x, q=y), both multi-observation, no
    # violations -> irrelevant
    assert got[("a.test", "sid")] == (2, 2, 0, True)
    # q: residual groups strip q -> '...p?sid=1' etc; the q=x/q=y pair
    # meets in the sid=1 group with fps 10 vs 20 -> violation
    n_g, ev, viol, irr = got[("a.test", "q")]
    assert viol >= 1 and irr is False


def test_min_support_floor(spark):
    rows = [
        ("http://a.test/p?once=1&q=x", 10),
        ("http://a.test/p?q=x", 10),
    ]
    got = _by_param(dust.param_relevance(_obs(spark, rows), min_support=2))
    # one evidence group only -> not promoted despite zero violations
    assert got[("a.test", "once")] == (1, 1, 0, False)
    loose = _by_param(dust.param_relevance(_obs(spark, rows), min_support=1))
    assert loose[("a.test", "once")][3] is True


def test_hosts_isolated(spark):
    rows = [
        ("http://a.test/p?sid=1&x=1", 1),
        ("http://a.test/p?sid=2&x=1", 1),
        ("http://b.test/p?sid=1&x=1", 5),
        ("http://b.test/p?sid=2&x=1", 6),  # sid changes content on b
    ]
    got = _by_param(dust.param_relevance(_obs(spark, rows), min_support=1))
    assert got[("a.test", "sid")][3] is True
    assert got[("b.test", "sid")] == (1, 1, 1, False)


def test_strip_round_trip(spark):
    rows = [
        ("http://a.test/p?page=2&utm2=zz", 1),
        ("http://a.test/p?page=2&utm2=aa", 1),
        ("http://a.test/p?page=2", 1),
        ("http://a.test/p?page=3&utm2=zz", 2),
        ("http://a.test/p?page=3", 2),
    ]
    obs = _obs(spark, rows)
    rules = dust.param_relevance(obs, min_support=2)
    stripped = dust.strip_mined_params(obs.select("url").distinct(), rules)
    got = {r["url"]: r["stripped_url"] for r in stripped.collect()}
    assert got["http://a.test/p?page=2&utm2=zz"] == "http://a.test/p?page=2"
    assert got["http://a.test/p?page=3&utm2=zz"] == "http://a.test/p?page=3"
    assert got["http://a.test/p?page=2"] == "http://a.test/p?page=2"
    # page is relevant -> survives; stripping collapses 5 aliases to 2 keys
    assert len(set(got.values())) == 2


def test_no_query_urls_pass_through_strip(spark):
    obs = _obs(spark, [("http://a.test/plain", 1)])
    rules = dust.param_relevance(obs)
    out = dust.strip_mined_params(obs.select("url"), rules).collect()
    assert out[0]["stripped_url"] == "http://a.test/plain"
