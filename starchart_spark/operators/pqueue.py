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
