"""Salted-keyed priority queue over repartitioned host buckets.

The north rule names the politeness scheduler "a salted-keyed priority
queue over repartitioned host buckets". A distributed priority queue is a
sort the consumer never materializes globally: each host's frontier
entries get a dense rank by (priority DESC, tiebreak ASC), and the token
bucket turns the rank into a send slot — ``slot = (rank-1) · rate`` (the
closed form of per-host pacing with zero arrivals, the same collapse the
engine uses, operators/politeness.py). "Pop the k best" is then a filter,
"schedule under a budget" a split on the slot.

The scale hazard is the mega-host: ``row_number() over (partition by
host order by priority)`` sorts github.com's 10^8 frontier rows in ONE
task. :func:`skew.ranked_by_host` is the two-pass fix — range-repartition
on ``(host, order key)`` so one host spans many tasks (THE salted keying:
the range boundaries are data-driven salt), rank locally, add broadcast
per-(task, host) offsets. This module is the thin scheduling layer over
that ranker; the engine's fixed crawl order (page, idx_in_page) is the
degenerate constant-priority case and keeps its plain-window fast path.

Reference anchor: the reference crawls hosts in seed order with no
priorities (src/spider.rs:36-223); the priority queue is the north rule's
scale extension, so its semantics are pinned by the DuckDB oracle
(``priority_queue`` in queries.py) and the parity test against the
plain-window formulation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from starchart_spark.operators import politeness, skew

RANK_COL = "pq_rank"


def pq_rank(
    frontier: DataFrame,
    host_col: str = "hostname",
    priority_col: str = "priority",
    tiebreak_cols: Sequence[str] = ("doc_id",),
    out_col: str = RANK_COL,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-host 1-based rank by (priority DESC, tiebreaks ASC), skew-proof.

    Highest priority first; ties broken deterministically so the queue
    order (and everything downstream — slots, budget splits, top-k pops)
    is a pure function of the input.
    """
    order = [priority_col, *tiebreak_cols]
    asc = [False] + [True] * len(tiebreak_cols)
    return skew.ranked_by_host(
        frontier, host_col, order, out_col=out_col,
        num_partitions=num_partitions, ascending=asc,
    )


def pq_schedule(
    frontier: DataFrame,
    budget_ms: int | None = None,
    host_col: str = "hostname",
    priority_col: str = "priority",
    tiebreak_cols: Sequence[str] = ("doc_id",),
    rate_col: str = "effective_rate_ms",
    slot_col: str = "slot_ms",
) -> tuple[DataFrame, DataFrame]:
    """(scheduled, deferred): rank → token-bucket slot → budget split.

    ``slot = (rank-1) · rate`` per host; entries whose slot falls outside
    the per-host batch budget defer exactly like the engine's politeness
    deferral (same split helper, same ``deferred_by_politeness``
    accounting when wired into a batch).
    """
    ranked = pq_rank(frontier, host_col, priority_col, tiebreak_cols)
    slotted = ranked.withColumn(
        slot_col, (F.col(RANK_COL) - 1).cast("long") * F.col(rate_col)
    )
    return politeness.split_by_budget(slotted, budget_ms, slot_col=slot_col)


def dequeue_topk(
    frontier: DataFrame,
    k: int,
    host_col: str = "hostname",
    priority_col: str = "priority",
    tiebreak_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Pop the k highest-priority entries per host (rank ≤ k filter —
    never a global sort)."""
    return pq_rank(frontier, host_col, priority_col, tiebreak_cols).filter(
        F.col(RANK_COL) <= k
    )


def allocate_budget(
    weights: DataFrame,
    total: int,
    host_col: str = "hostname",
    weight_col: str = "weight",
    out_col: str = "budget",
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer fetch
    budget across hosts, proportional to ``weight_col`` — the scheduling
    bridge from :mod:`graph`'s PageRank to per-host crawl quotas:
    sum(budget) == total EXACTLY, every step integer (deterministic on any
    engine/partitioning).

        base_i = total·w_i div W ;  rem_i = (total·w_i) mod W
        leftover = total − Σ base_i  →  +1 to the ``leftover`` largest
        remainders (hostname-asc tie-break)

    Caller contract: ``total · max(w) < 2^63`` (pre-scale huge weights —
    PageRank micro-units at 10^12 allow totals up to ~10^6 unscaled).
    Shapes: two 1-row cross joins carry the scalars in-plan (no driver
    collect); the global remainder rank uses :func:`skew.ranked_by_host`'s
    two-pass form over a constant partition key, so even a 10^8-host dim
    never sorts in one task. Negative weights clamp to 0 (a negative base
    would break Σ == total); an ALL-zero dim switches to uniform Hamilton
    (weight 1 per host) — the leftover ≤ n−1 bound that makes the +1 pass
    sufficient only holds when W is the true Σw, and a forced W=1 under
    Σw=0 let ``total > n`` leak budget (caught by the hypothesis quota
    test: weights=[0], total=2 summed to 1).
    """
    w = weights.select(
        F.col(host_col).alias("hostname"),
        F.greatest(F.col(weight_col).cast("long"), F.lit(0)).alias("__w"),
    )
    tot = w.agg(
        F.coalesce(F.sum("__w"), F.lit(0)).alias("__Wraw"),
        F.count(F.lit(1)).alias("__n"),
    )
    # alias both sides: tot derives from w, and Spark 4's analyzer flags
    # the re-used __w attribute in the self-lineage cross join as ambiguous
    based = (
        w.alias("__wl").crossJoin(F.broadcast(tot.alias("__tr")))
        .select(
            F.col("__wl.hostname").alias("hostname"),
            F.expr(
                "CASE WHEN __tr.__Wraw = 0 THEN CAST(1 AS BIGINT)"
                " ELSE __wl.__w END"
            ).alias("__we"),
            F.expr(
                "CASE WHEN __tr.__Wraw = 0 THEN __tr.__n"
                " ELSE __tr.__Wraw END"
            ).alias("__W"),
        )
        .select(
            "hostname",
            F.expr(f"CAST({total} AS BIGINT) * __we div __W").alias("__base"),
            F.expr(f"(CAST({total} AS BIGINT) * __we) % __W").alias("__rem"),
        )
    )
    leftover = based.agg(
        (F.lit(total) - F.coalesce(F.sum("__base"), F.lit(0))).alias("__L")
    )
    ranked = skew.ranked_by_host(
        based.withColumn("__all", F.lit(1)),
        "__all",
        ["__rem", "hostname"],
        out_col="__rr",
        ascending=[False, True],
    )
    return (
        ranked.alias("__rl").crossJoin(F.broadcast(leftover.alias("__lr")))
        .select(
            F.col("__rl.hostname").alias(host_col),
            (
                F.col("__rl.__base")
                + F.when(F.col("__rl.__rr") <= F.col("__lr.__L"), 1).otherwise(0)
            ).cast("long").alias(out_col),
        )
    )


def waterfill_budget(
    caps: DataFrame,
    total: int,
    group_col: str = "lang",
    cap_col: str = "cap",
    out_col: str = "budget",
) -> DataFrame:
    """UNIMAX-style capped-uniform apportionment (waterfilling): split an
    integer budget EVENLY across groups, except no group can exceed its
    capacity — capped groups' unused share flows to the others (Chung et
    al. 2023 use exactly this to set per-language budgets: uniform up to
    each language's corpus size × max epochs).

    Exact-integer waterfilling: the level t is the largest integer with
    Σ min(cap_g, t) ≤ total, found in closed form from ONE ordered scan —
    with caps sorted ascending (group-asc tie-break), prefix sums P and
    rank j, the FIRST row where

        g(j) = (total − P_{j−1}) div (G − j + 1)  <  cap_j

    is the crossing and t = g(j) there (rows before it are fully capped by
    construction; validated against brute force over 50k random cases in
    tests). No crossing ⇒ total ≥ Σcap ⇒ every group gets its cap. The
    leftover r = total − Σ min(cap_g, t) satisfies r < #{cap_g > t}
    (else t+1 would fit) and goes +1 to the r uncapped groups first in
    group-asc order, so Σ budget == min(total, Σcap) EXACTLY and every
    step is integer (engine/partition-independent).

    Shapes: the ordered scan is :func:`skew.ordered_prefix` (two-pass
    range-partition prefix — a 10^8-group dim never sorts in one task);
    the crossing is a ``min_by``-shaped aggregate; scalars ride 1-row
    broadcast cross joins like :func:`allocate_budget`. Negative caps
    clamp to 0. Composes with packing.mixture_sample as its per-stratum
    target table."""
    from starchart_spark.operators import skew

    c = caps.select(
        F.col(group_col).alias("__g"),
        F.greatest(F.col(cap_col).cast("long"), F.lit(0)).alias("__c"),
    )
    pre = skew.ordered_prefix(
        c, ["__c", "__g"], "__c", rank_col="__j", prefix_col="__P"
    )
    dims = pre.agg(
        F.count(F.lit(1)).alias("__G"),
        F.coalesce(F.sum("__c"), F.lit(0)).alias("__S"),
        F.coalesce(F.max("__c"), F.lit(0)).alias("__cmax"),
    )
    cand = (
        pre.alias("__pl")
        .crossJoin(F.broadcast(dims.alias("__dr")))
        .select(
            "__pl.__g",
            "__pl.__c",
            "__pl.__j",
            F.expr(
                f"(CAST({total} AS BIGINT) - __pl.__P) div (__dr.__G - __pl.__j + 1)"
            ).alias("__t"),
        )
    )
    # the crossing: smallest j with g(j) < cap_j; no crossing -> cmax
    # (every group at cap). min of a (j, t) struct orders by j first.
    t_dim = (
        cand.filter(F.col("__t") < F.col("__c"))
        # NB: not "__s" — column resolution is case-insensitive and would
        # collide with dims' __S after the cross join
        .agg(F.min(F.struct("__j", "__t")).alias("__mins"))
        .crossJoin(F.broadcast(dims))
        .select(F.coalesce(F.col("__mins.__t"), F.col("__cmax")).alias("__t"))
    )
    leveled = (
        c.alias("__cl")
        .crossJoin(F.broadcast(t_dim.alias("__tr")))
        .select(
            "__cl.__g",
            "__cl.__c",
            F.least(F.col("__cl.__c"), F.col("__tr.__t")).alias("__lvl"),
            (F.col("__cl.__c") > F.col("__tr.__t")).alias("__uncapped"),
        )
    )
    r_dim = leveled.agg(
        (F.lit(total) - F.coalesce(F.sum("__lvl"), F.lit(0))).alias("__r")
    )
    extra_rank = skew.ranked_by_host(
        leveled.withColumn("__all", F.lit(1)),
        "__all",
        ["__uncapped", "__g"],
        out_col="__er",
        ascending=[False, True],
    )
    return (
        extra_rank.alias("__el")
        .crossJoin(F.broadcast(r_dim.alias("__rr")))
        .select(
            F.col("__el.__g").alias(group_col),
            (
                F.col("__el.__lvl")
                + F.when(
                    F.col("__el.__uncapped")
                    & (F.col("__el.__er") <= F.col("__rr.__r")),
                    1,
                ).otherwise(0)
            ).cast("long").alias(out_col),
        )
    )
