"""AIMD per-host rate controller (operators/aimd.py): fold semantics vs a
Python reference recursion, epoch chaining through ``prior``, clamping, and
the delay-dim conversion that feeds the politeness layer."""

from __future__ import annotations

from pyspark.sql import functions as F

from starchart_spark.operators import aimd

R0, ADD, MIN, MAX = 1_000, 50, 10, 4_000


def _ref_fold(events, r0=R0, add=ADD):
    """events: list[(ts, ok)] — the recursion the operator must replay."""
    rate = r0
    for _, ok in sorted(events):
        rate = rate + add if ok else rate >> 1
    return rate


def _attempts(spark, rows):
    return spark.createDataFrame(rows, "hostname string, ts long, ok boolean")


LOG = [
    # host a: mixed outcomes, shuffled ts order on purpose
    ("a", 5, False),
    ("a", 1, True),
    ("a", 3, True),
    ("a", 2, False),
    ("a", 4, True),
    ("a", 6, False),
    # host b: all success — pure additive climb
    ("b", 1, True),
    ("b", 2, True),
    ("b", 3, True),
    # host c: failure storm — decays toward 0 (applied clamps at MIN)
    *[("c", t, False) for t in range(1, 12)],
]


def test_fold_matches_reference(spark):
    out = {
        r["hostname"]: r
        for r in aimd.aimd_rates(
            _attempts(spark, LOG), r0_mu=R0, add_mu=ADD, min_mu=MIN, max_mu=MAX
        ).collect()
    }
    for host in ("a", "b", "c"):
        ev = [(t, ok) for h, t, ok in LOG if h == host]
        want = _ref_fold(ev)
        assert out[host]["rate_mu"] == want, host
        assert out[host]["applied_mu"] == min(max(want, MIN), MAX)
        assert out[host]["n_attempts"] == len(ev)
        assert out[host]["n_fails"] == sum(1 for _, ok in ev if not ok)
    # the storm host really decayed to the clamp floor
    assert out["c"]["rate_mu"] == 0
    assert out["c"]["applied_mu"] == MIN
    # the healthy host climbed additively
    assert out["b"]["rate_mu"] == R0 + 3 * ADD


def test_epoch_chaining_equals_single_fold(spark):
    """Folding [epoch1; epoch2] must equal folding epoch1, carrying its
    rate_mu dim as epoch2's prior — the property that lets a perpetual
    crawl keep per-epoch logs bounded while the controller state lives in
    a broadcast-size dim."""
    cut = 4
    e1 = [(h, t, ok) for h, t, ok in LOG if t <= cut]
    e2 = [(h, t, ok) for h, t, ok in LOG if t > cut]
    whole = {
        r["hostname"]: r["rate_mu"]
        for r in aimd.aimd_rates(_attempts(spark, LOG), r0_mu=R0, add_mu=ADD).collect()
    }
    first = aimd.aimd_rates(_attempts(spark, e1), r0_mu=R0, add_mu=ADD)
    chained = {
        r["hostname"]: r["rate_mu"]
        for r in aimd.aimd_rates(
            _attempts(spark, e2), r0_mu=R0, add_mu=ADD, prior=first
        ).collect()
    }
    # host b has no epoch-2 events; its carried state is epoch-1's fold
    first_rates = {r["hostname"]: r["rate_mu"] for r in first.collect()}
    for host, want in whole.items():
        got = chained.get(host, first_rates.get(host))
        assert got == want, host


def test_prior_unknown_host_starts_at_r0(spark):
    prior = spark.createDataFrame([("x", 2_000)], "hostname string, rate_mu long")
    out = {
        r["hostname"]: r["rate_mu"]
        for r in aimd.aimd_rates(
            _attempts(spark, [("x", 1, True), ("y", 1, True)]),
            r0_mu=R0,
            add_mu=ADD,
            prior=prior,
        ).collect()
    }
    assert out["x"] == 2_000 + ADD
    assert out["y"] == R0 + ADD


def test_to_delay_ms_exact(spark):
    rates = aimd.aimd_rates(
        _attempts(spark, LOG), r0_mu=R0, add_mu=ADD, min_mu=MIN, max_mu=MAX
    )
    delays = {
        r["hostname"]: r["effective_rate_ms"]
        for r in aimd.to_delay_ms(rates).collect()
    }
    applied = {r["hostname"]: r["applied_mu"] for r in rates.collect()}
    for host, mu in applied.items():
        assert delays[host] == 1_000_000 // max(mu, 1)
    # storm host paces at the floor: 10 milli-req/s -> 100 s between calls
    assert delays["c"] == 100_000


def test_no_python_stage(spark):
    """The fold is JVM higher-order functions end to end."""
    plan = aimd.aimd_rates(_attempts(spark, LOG))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_merge_consent_most_conservative(spark):
    """AIMD -> consent-table coupling: the failure-storm host's pacing
    slows to the controller's delay, healthy hosts keep the static rate,
    and consent_gate consumes the merged dim unchanged."""
    from starchart_spark.operators import politeness

    rates = aimd.aimd_rates(
        _attempts(spark, LOG), r0_mu=R0, add_mu=ADD, min_mu=MIN, max_mu=MAX
    )
    consent = spark.createDataFrame(
        [("a", True, True, 500), ("b", True, True, None), ("c", True, True, 500)],
        "hostname string, verified boolean, spidering boolean, rate_ms long",
    )
    merged = {r["hostname"]: r["rate_ms"] for r in aimd.merge_consent(consent, rates).collect()}
    # b climbed to 1150 mu -> 869 ms < default 2000 -> static wins
    assert merged["b"] == 2_000
    # c decayed to the 10 mu floor -> 100 s between calls dominates
    assert merged["c"] == 100_000
    # a: fold gives some rate; merged is max(500, delay)
    assert merged["a"] >= 500
    gated = politeness.consent_gate(
        spark.createDataFrame([("c",)], "hostname string"),
        aimd.merge_consent(consent, rates),
    )
    assert gated.collect()[0]["effective_rate_ms"] == 100_000


def test_jain_fairness_known_values(spark):
    """Equal allocation -> 1.0; one-hot allocation over n hosts -> 1/n;
    hand case 4,2,2 -> 64/(3*24) = 0.888889. Exact-rational columns carry
    the index as integers."""
    eq = spark.createDataFrame(
        [("a", 5), ("b", 5), ("c", 5)], "hostname string, applied_mu long"
    )
    r = aimd.jain_fairness(eq).collect()[0]
    assert (r["n"], r["sum_x"], r["sum_x2"]) == (3, 15, 75)
    assert r["j_num"] == 225 and r["j_den"] == 225 and r["fairness"] == 1.0
    hot = spark.createDataFrame(
        [("a", 9), ("b", 0), ("c", 0)], "hostname string, applied_mu long"
    )
    assert aimd.jain_fairness(hot).collect()[0]["fairness"] == round(1 / 3, 6)
    mid = spark.createDataFrame(
        [("a", 4), ("b", 2), ("c", 2)], "hostname string, applied_mu long"
    )
    assert aimd.jain_fairness(mid).collect()[0]["fairness"] == round(64 / 72, 6)


def test_jain_fairness_grouped(spark):
    alloc = spark.createDataFrame(
        [("g", "a", 3), ("g", "b", 3), ("h", "c", 6), ("h", "d", 0)],
        "forge_type string, hostname string, applied_mu long",
    )
    out = {
        r["scope"]: r["fairness"]
        for r in aimd.jain_fairness(alloc, by="forge_type").collect()
    }
    assert out["g"] == 1.0 and out["h"] == 0.5
