"""Dedup / URL-seen membership operators (SURVEY.md §2.2, D2-D9).

The reference's exists-gates (``forge_exists`` / ``user_exists`` /
``repository_exists``, /root/reference/db/db-sqlx-sqlite/src/lib.rs:462-602,
gated per item at /root/reference/src/spider.rs:46-119) are row-at-a-time
SELECTs. Set-oriented re-expression: a single ``left_anti`` join of the
candidate batch against the seen-set table — one shuffle instead of N round
trips, and Catalyst/AQE pick broadcast vs sort-merge.

Keep-first in-batch dedup (D5, forge/gitea/src/lib.rs:117-124: first
occurrence of a username in page order wins) is a ``row_number() = 1`` window
— NOT ``dropDuplicates``, which keeps an arbitrary row under shuffle and
would break crawl determinism.

Scale notes: candidates and seen-set are both keyed by ``host_bucket`` so the
anti-join is co-partitioned; the bloom pre-filter (operators/bloom.py) drops
definitely-new rows from the probe side before the shuffle. At 10^10 seen
rows the exact side never broadcasts; the bloom layer is what keeps the
confirm join small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keep_first(
    df: DataFrame, key_cols: Sequence[str], order_cols: Sequence[str]
) -> DataFrame:
    """Deterministic first-occurrence dedup (D5).

    ``order_cols`` must be a total order within each key group (e.g. the
    crawl-order columns forge_id, page, idx_in_page) so the result is a pure
    function of the data, never of task scheduling.
    """
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def keep_first_agg(
    df: DataFrame, key_cols: Sequence[str], order_col: str
) -> DataFrame:
    """Keep-first as an aggregation: ``min_by(struct(*), order)`` per key.

    Same result as ``keep_first`` for a single total-order column, but with
    map-side partial aggregation (``partial_min_by`` before the exchange) —
    duplicates collapse before they shuffle, unlike the window variant which
    moves every row. The right shape when duplicates are common and rows are
    narrow (e.g. frontier keys). Column order is preserved.
    """
    cols = df.columns
    picked = df.groupBy(*key_cols).agg(
        F.min_by(F.struct(*[c for c in cols if c not in key_cols]), F.col(order_col)).alias(
            "__row"
        )
    )
    return picked.select(
        *key_cols, *[F.col(f"__row.{c}").alias(c) for c in cols if c not in key_cols]
    ).select(*cols)


def anti_join_seen(
    candidates: DataFrame, seen: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Rows of ``candidates`` whose key is absent from ``seen`` (D2-D4).

    Exact membership; first writer wins when the result is merged back.
    NULL-safe on every key column (``<=>``): the engine's user keys carry
    key2=NULL and forge keys key1=key2=NULL, and the reference's UNIQUE
    gates treat those as equal — plain ``=`` would silently pass every
    previously-seen NULL-keyed row through the gate. Spark hash-joins on
    EqualNullSafe keys, so this stays a co-partitioned hash join.
    """
    s = seen.select(
        *[F.col(c).alias(f"__seen_{c}") for c in key_cols]
    ).dropDuplicates([f"__seen_{c}" for c in key_cols])
    cond = None
    for c in key_cols:
        eq = candidates[c].eqNullSafe(s[f"__seen_{c}"])
        cond = eq if cond is None else cond & eq
    return candidates.join(s, cond, "left_anti")


def seen_filter(
    candidates: DataFrame,
    seen: DataFrame,
    key_cols: Sequence[str],
    bloom_maybe_col: str | None = None,
) -> DataFrame:
    """Bloom-accelerated exact membership filter.

    If ``bloom_maybe_col`` is set (a boolean column produced by
    ``bloom.probe``: True = *maybe* seen, False = *definitely* new), rows
    flagged False skip the exact anti-join entirely — the optimization can
    only shrink the join probe side, never flip an answer (SURVEY.md §2.2
    contract).
    """
    if bloom_maybe_col is None:
        return anti_join_seen(candidates, seen, key_cols)
    definitely_new = candidates.filter(~F.col(bloom_maybe_col))
    maybe = candidates.filter(F.col(bloom_maybe_col))
    confirmed_new = anti_join_seen(maybe, seen, key_cols)
    return definitely_new.unionByName(confirmed_new)
