"""Property-based tests (hypothesis) over the DataFrame operators whose
guarantees are algebraic — small example budgets (each example builds a
real Spark plan), targeting the invariants a unit test can only spot-check:
Hamilton's quota rule for arbitrary weight vectors, CMS's one-sided error
for arbitrary multisets, HLL's multiset-insensitivity."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from starchart_spark.operators import pqueue, sketch

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    weights=st.lists(
        st.integers(min_value=-100, max_value=10_000), min_size=1, max_size=12
    ),
    total=st.integers(min_value=0, max_value=50_000),
)
@settings(**_SETTINGS)
def test_allocate_budget_quota_rule(spark, weights, total):
    """Σbudget == total EXACTLY, and every host satisfies Hamilton's quota
    rule: floor(ideal share) ≤ budget ≤ ceil(ideal share) (negative
    weights clamp to 0 first)."""
    rows = [(f"h{i:02d}", w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, ["hostname", "weight"])
    out = {
        r["hostname"]: r["budget"]
        for r in pqueue.allocate_budget(df, total=total).collect()
    }
    assert sum(out.values()) == total
    clamped = {f"h{i:02d}": max(w, 0) for i, w in enumerate(weights)}
    w_total = sum(clamped.values())
    if w_total == 0:
        # degenerate all-zero dim → uniform Hamilton (weight 1 per host)
        clamped = {h: 1 for h in clamped}
        w_total = len(clamped)
    for h, b in out.items():
        num = total * clamped[h]
        lo, rem = divmod(num, w_total)
        assert lo <= b <= lo + (1 if rem else 0), (h, b, num, w_total)


@given(
    keys=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=60)
)
@settings(**_SETTINGS)
def test_cms_never_undercounts(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], ["key"])
    true = {k: keys.count(k) for k in set(keys)}
    sk = sketch.cms_build(df, "key", d=3, w=64, portable=True)
    est = {
        r["key"]: r["est"]
        for r in sketch.cms_lookup(
            sk, df.select("key").distinct(), "key", d=3, w=64, portable=True
        ).collect()
    }
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)


@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60
    ),
    copies=st.integers(min_value=1, max_value=3),
)
@settings(**_SETTINGS)
def test_hll_depends_only_on_distinct_set(spark, keys, copies):
    df = spark.createDataFrame([(k,) for k in keys], ["key"])
    rep = df
    for _ in range(copies):
        rep = rep.union(df)
    a = sketch.hll_estimate(df, "key", b=6, portable=True).collect()[0]["est"]
    b = sketch.hll_estimate(rep, "key", b=6, portable=True).collect()[0]["est"]
    assert a == b
