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
