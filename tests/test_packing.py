"""Sequence packing + mixture sampling (operators/packing.py): known
assignments incl. boundary-straddling and zero-token docs, budget semantics
(keep-all / drop-all / partial), and partition invariance. sf-scale oracle
parity rides the ``pack_sequences`` / ``mixture_sample`` registry entries."""

from __future__ import annotations

from pyspark.sql import functions as F

from starchart_spark.operators import packing, sampling

P31 = sampling.P31


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def _words(n):
    return " ".join(f"w{i}" for i in range(n))


def test_pack_known_assignments(spark):
    # source A stream: 6 + 4 + 3 + 7 tokens, context 10:
    #   doc0 starts at 0  -> seq 0
    #   doc1 starts at 6  -> seq 0 (straddles the 10-boundary, stays in 0)
    #   doc2 starts at 10 -> seq 1 (starts exactly ON the boundary)
    #   doc3 starts at 13 -> seq 1
    # plus an empty doc4 at the head of source B and a 12-token doc5
    rows = [
        (0, _words(6), "en", "A"),
        (1, _words(4), "en", "A"),
        (2, _words(3), "en", "A"),
        (3, _words(7), "en", "A"),
        (4, "", "en", "B"),
        (5, _words(12), "en", "B"),
    ]
    out = {
        (r.source, r.seq_id): (r.n_docs, r.n_tokens, r.first_doc_id, r.last_doc_id)
        for r in packing.pack_sequences(
            _docs(spark, rows), context_len=10, group_col="source"
        ).collect()
    }
    assert out == {
        ("A", 0): (2, 10, 0, 1),
        ("A", 1): (2, 10, 2, 3),
        # doc4 has 0 tokens and starts at offset 0; doc5 also starts at 0
        ("B", 0): (2, 12, 4, 5),
    }


def test_pack_partition_invariance(spark):
    rows = [(i, _words(3 + i % 5), "en", f"s{i % 3}") for i in range(60)]
    df = _docs(spark, rows)
    a = sorted(
        map(tuple, packing.pack_sequences(df, 16).collect())
    )
    b = sorted(
        map(tuple, packing.pack_sequences(df.repartition(13, "doc_id"), 16).collect())
    )
    assert a == b and len(a) > 3


def test_mixture_budget_semantics(spark):
    # en: huge target -> rate 1, keep all; de: absent -> drop all;
    # fr: target = half the total -> threshold = trunc(0.5 * P31)
    rows = (
        [(i, _words(10), "en", "s") for i in range(20)]
        + [(100 + i, _words(10), "de", "s") for i in range(20)]
        + [(200 + i, _words(10), "fr", "s") for i in range(40)]
    )
    df = _docs(spark, rows)
    targets = spark.createDataFrame(
        [("en", 10_000), ("fr", 200)], "lang string, target_tokens long"
    )
    kept = {r.doc_id for r in packing.mixture_sample(df, targets).collect()}
    assert {i for i in range(20)} <= kept
    assert not any(100 <= d < 200 for d in kept)
    # fr acceptance replicates the selector arithmetic exactly
    thresh = int(0.5 * P31)
    expect_fr = {
        d for d in range(200, 240) if ((d % P31) * 1_327_217_885 + 12_345) % P31 < thresh
    }
    assert {d for d in kept if d >= 200} == expect_fr


def test_mixture_rates_shape(spark):
    rows = [(i, _words(4), "en", "s") for i in range(5)]
    targets = spark.createDataFrame([("en", 10)], "lang string, target_tokens long")
    r = packing.mixture_rates(_docs(spark, rows), targets).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.lang, row.total_tokens, row.target_tokens) == ("en", 20, 10)
    assert abs(row.rate - 0.5) < 1e-12


def test_mixture_partition_invariance(spark):
    rows = [(i, _words(2 + i % 7), ["en", "fr"][i % 2], "s") for i in range(100)]
    df = _docs(spark, rows)
    targets = spark.createDataFrame(
        [("en", 100), ("fr", 50)], "lang string, target_tokens long"
    )
    a = sorted(r.doc_id for r in packing.mixture_sample(df, targets).collect())
    b = sorted(
        r.doc_id
        for r in packing.mixture_sample(df.repartition(17), targets).collect()
    )
    assert a == b and 0 < len(a) < 100


def test_mixture_broadcast_plan(spark):
    # the rate dim must broadcast — a shuffle join on a 5-row dim would be
    # the wrong plan at any scale
    rows = [(i, _words(3), "en", "s") for i in range(10)]
    targets = spark.createDataFrame([("en", 10)], "lang string, target_tokens long")
    plan = packing.mixture_sample(_docs(spark, rows), targets)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_temperature_flattens_the_mixture(spark):
    # power-law corpus: en 64x the tokens of fr
    rows = (
        [(i, _words(64), "en", "A") for i in range(100)]
        + [(1000 + i, _words(16), "de", "A") for i in range(25)]
        + [(2000 + i, _words(4), "fr", "A") for i in range(25)]
    )
    out = {
        r.strata: r
        for r in packing.temperature_rates(
            _docs(spark, rows), alpha=0.5, budget_tokens=1_000_000
        ).collect()
    }
    totals = {"en": 6400, "de": 400, "fr": 100}
    grand = sum(totals.values())
    assert {s: r.total_tokens for s, r in out.items()} == totals
    # probabilities: p_i = sqrt(n_i)/sum(sqrt) -> 80/(80+20+10)
    assert abs(out["en"].p - 80 / 110) < 1e-6
    assert abs(out["fr"].p - 10 / 110) < 1e-6
    assert abs(sum(r.p for r in out.values()) - 1.0) < 2e-6
    # flattening: head share shrinks vs raw, tail share grows
    assert out["en"].p < totals["en"] / grand
    assert out["fr"].p > totals["fr"] / grand
    # targets are the budget split by p; rates cap at 1 (up-sampling
    # saturates -- every stratum here is far smaller than its target)
    for s, r in out.items():
        assert r.target_tokens == round(round(r.p, 6) * 1_000_000)
        assert r.rate == 1.0


def test_temperature_rates_downsample(spark):
    # tiny budget: every stratum must be cut, proportionally to p/n
    rows = [(i, _words(10), "en" if i % 2 else "de", "A") for i in range(40)]
    out = {
        r.strata: r
        for r in packing.temperature_rates(
            _docs(spark, rows), alpha=0.5, budget_tokens=100
        ).collect()
    }
    for s, r in out.items():
        assert 0.0 < r.rate < 1.0
        assert abs(r.rate - r.target_tokens / r.total_tokens) < 1e-6


def test_temperature_sample_mass_and_replay(spark):
    rows = (
        [(i, _words(20), "en", "A") for i in range(200)]
        + [(10_000 + i, _words(20), "fr", "A") for i in range(50)]
    )
    df = _docs(spark, rows)
    budget = 2_000
    sampled = packing.temperature_sample(df, alpha=0.5, budget_tokens=budget)
    got = {
        r.lang: r.n
        for r in sampled.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    rates = {
        r.strata: r
        for r in packing.temperature_rates(
            df, alpha=0.5, budget_tokens=budget
        ).collect()
    }
    for lang, n_docs in (("en", 200), ("fr", 50)):
        expect = rates[lang].rate * n_docs
        assert abs(got.get(lang, 0) - expect) <= max(3, 0.35 * expect), lang
    # replay: identical draw for the same salt, different for another
    a = sorted(r.doc_id for r in sampled.collect())
    b = sorted(
        r.doc_id
        for r in packing.temperature_sample(
            df, alpha=0.5, budget_tokens=budget
        ).collect()
    )
    assert a == b
