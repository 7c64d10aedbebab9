"""Adaptive re-crawl scheduling — change-rate-proportional TTLs per host.

The reference re-crawls every host on one fixed TTL (config/default.toml:35,
src/spider.rs:192-202 — engine P3, ``reactivate_due``). At open-frontier
scale that either hammers static hosts or goes stale on active ones; the
standard fix (Cho & Garcia-Molina, "Effective page refresh policies for web
crawlers", TODS 2003) spaces revisits inversely to the observed change
rate. This module is that policy in EXACT-INTEGER form:

    rate ≈ changes / visits   ⇒   ttl = clamp(base · visits div (changes+1),
                                              min_ttl, max_ttl)
    next_due = last_visit + ttl

The +1 is add-one smoothing (a never-changed host gets base·n, capped); the
paper's Poisson-MLE estimator λ̂ = −ln(1−X/n)/Δ needs libm ``ln`` whose
last digit differs per engine — the rational form keeps the schedule a pure
integer function of the visit log (the repo's cross-engine exactness
discipline), while preserving the estimator's monotonicity in the observed
change fraction, which is all the scheduler consumes.

Shape: ONE hash aggregate over the visit/change log keyed by host —
map-side partial, no window, no skew hazard (per-host state is 4 counters
however mega the host). The output dim joins the engine state exactly where
``reactivate_due``'s fixed TTL sits today.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recrawl_schedule(
    visits: DataFrame,
    base_ttl: int,
    min_ttl: int,
    max_ttl: int,
    host_col: str = "hostname",
    ts_col: str = "ts",
    changed_col: str = "changed",
) -> DataFrame:
    """(hostname, n_visits, n_changes, last_ts, ttl, next_due).

    ``visits``: one row per completed visit with an epoch ``ts_col`` (any
    unit, as long as the TTL bounds share it) and boolean ``changed_col``
    (content differed from the previous visit — e.g. a fingerprint mismatch
    from :mod:`winnow` or a span-hash change). All arithmetic on BIGINT:
    deterministic on any partitioning/engine.
    """
    agg = visits.groupBy(F.col(host_col).alias("hostname")).agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.sum(F.col(changed_col).cast("long")).alias("n_changes"),
        F.max(F.col(ts_col)).cast("long").alias("last_ts"),
    )
    raw_ttl = F.expr(f"{base_ttl} * n_visits div (n_changes + 1)")
    ttl = F.least(F.greatest(raw_ttl, F.lit(min_ttl)), F.lit(max_ttl))
    return agg.select(
        "hostname",
        "n_visits",
        "n_changes",
        "last_ts",
        ttl.cast("long").alias("ttl"),
        (F.col("last_ts") + ttl).cast("long").alias("next_due"),
    )


def due_hosts(schedule: DataFrame, now: int) -> DataFrame:
    """Hosts whose adaptive TTL has elapsed — the drop-in replacement for
    the fixed-TTL predicate in ``CrawlEngine.reactivate_due`` (join this
    dim on hostname instead of comparing against one constant)."""
    return schedule.filter(F.lit(now) >= F.col("next_due")).select("hostname")


def failure_backoff(
    attempts: DataFrame,
    base_ms: int = 60_000,
    cap: int = 10,
    host_col: str = "hostname",
    ts_col: str = "ts",
    ok_col: str = "ok",
) -> DataFrame:
    """Per-host exponential retry backoff from a fetch-attempt log:
    (host, fails_since_ok, last_ts, next_attempt) with

        next_attempt = last_ts + base_ms · 2^min(fails_since_ok, cap)

    (fails_since_ok = attempts strictly after the host's last success;
    a currently-healthy host retries after one base interval). The
    reference surfaces fetch errors and moves on (src/spider.rs error
    paths); at open-frontier scale a dead host must not burn its
    politeness slot every cycle — truncated binary backoff is the
    standard remedy, and the doubling is exact integer shift arithmetic,
    so the schedule replays identically on any engine.

    Shape: two host-keyed hash aggregates (last-success ts, then trailing
    failure count) — map-side partials, no window, per-host state is two
    longs however mega the host. Composes with ``due_hosts`` /
    ``reactivate_due`` as the error-path sibling of the change-rate TTL.
    """
    per_host = attempts.groupBy(F.col(host_col).alias("hostname")).agg(
        F.max(F.when(F.col(ok_col), F.col(ts_col))).alias("__last_ok"),
        F.max(F.col(ts_col)).alias("last_ts"),
    )
    fails = (
        attempts.select(F.col(host_col).alias("hostname"), ts_col, ok_col)
        .join(per_host, "hostname")
        .filter(
            ~F.col(ok_col)
            & (
                F.col("__last_ok").isNull()
                | (F.col(ts_col) > F.col("__last_ok"))
            )
        )
        .groupBy("hostname")
        .agg(F.count(F.lit(1)).alias("fails_since_ok"))
    )
    return (
        per_host.join(fails, "hostname", "left")
        .select(
            "hostname",
            F.coalesce(F.col("fails_since_ok"), F.lit(0))
            .cast("long")
            .alias("fails_since_ok"),
            F.col("last_ts").cast("long").alias("last_ts"),
            (
                F.col("last_ts")
                + F.lit(base_ms)
                * F.expr(
                    f"shiftleft(CAST(1 AS BIGINT),"
                    f" CAST(least(coalesce(fails_since_ok, 0), {cap}) AS INT))"
                )
            ).cast("long").alias("next_attempt"),
        )
    )


def revisit_plan(
    responses: "DataFrame",
    sitemap_status: "DataFrame",
    schedule: "DataFrame",
    now_s: int,
    url_col: str = "url",
    host_col: str = "hostname",
) -> "DataFrame":
    """Merge the three revisit signals a production crawler holds into ONE
    per-URL next action — the composition the reference's fixed-TTL sleep
    loop (src/spider.rs:192-202) flattens into "re-crawl everything":

    - RFC 9111 cache state (:mod:`cachectl` — server-granted freshness,
      validators for conditional GETs),
    - the host's sitemap assertions (:mod:`sitemaps` recrawl_delta —
      ``new`` / ``updated`` / ``unchanged`` per URL),
    - the adaptive host TTL (:func:`recrawl_schedule` — change-rate-
      proportional ``next_due``).

    Precedence (documented, exact, oracle-replayed):

    1. sitemap ``new``/``updated`` → **fetch** — the host asserted change;
       trusting it costs one fetch, ignoring it costs staleness. Overrides
       the host TTL deferral (politeness still paces the actual fetch —
       pacing is the fetch layer's job, not the planner's).
    2. host not yet due (``now_s < next_due``) → **defer**; hosts absent
       from the schedule are first-sighting, treated as due.
    3. cache ``fresh`` → **skip** (serve the stored copy this cycle).
    4. cache ``revalidate`` → **revalidate** (send ``cond_header``).
    5. otherwise → **fetch**.

    ``next_check_s`` is the earliest instant the answer could change:
    ``next_due`` for defers, ``fetched_s + fresh_for_s`` for skips,
    ``now_s`` otherwise — the scheduler's wake-up index.

    Shape: the cache decision is a zero-shuffle projection; sitemap status
    joins on the URL key (host-prefixed — co-located with the engine's
    bucket layout); the schedule is a host-sized broadcast dim. No new
    exchange beyond the URL equi-join at any corpus size.
    """
    from starchart_spark.operators import cachectl

    d = cachectl.cache_decision(responses, now_s=now_s)
    sm = sitemap_status.select(
        F.col(url_col), F.col("status").alias("__sm")
    )
    sch = schedule.select(F.col(host_col), F.col("next_due").alias("__due"))
    j = d.join(sm, url_col, "left").join(F.broadcast(sch), host_col, "left")
    sm_hit = F.col("__sm").isin("new", "updated")
    deferred = F.col("__due").isNotNull() & (F.lit(int(now_s)) < F.col("__due"))
    action = (
        F.when(sm_hit, F.lit("fetch"))
        .when(deferred, F.lit("defer"))
        .when(F.col("decision") == "fresh", F.lit("skip"))
        .when(F.col("decision") == "revalidate", F.lit("revalidate"))
        .otherwise(F.lit("fetch"))
    )
    next_check = (
        F.when(sm_hit, F.lit(int(now_s)))
        .when(deferred, F.col("__due"))
        .when(
            F.col("decision") == "fresh",
            F.col("fetched_s") + F.col("fresh_for_s"),
        )
        .otherwise(F.lit(int(now_s)))
    )
    return j.select(
        F.col(host_col),
        F.col(url_col),
        "decision",
        "fresh_for_s",
        "cond_header",
        F.coalesce(F.col("__sm"), F.lit("none")).alias("sitemap_status"),
        F.col("__due").alias("host_next_due"),
        action.alias("action"),
        next_check.cast("long").alias("next_check_s"),
    )
