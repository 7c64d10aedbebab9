"""Skew handling: salting + two-phase aggregation (SURVEY.md §4).

A mega-forge (think github.com in a frontier of small Gitea hosts) puts
10^8+ URLs under one host key. Hash-partitioning by host alone would send
them to one task. Mitigations, in order of preference:

1. **AQE skew join** — enabled in session.py; splits oversized shuffle
   partitions at runtime. Zero code. This is the backstop.
2. **Explicit salting** (this module) — spread one host's rows over
   ``salt ∈ [0, S)`` subkeys for the heavy stages (fetch, parse, dedup,
   merge), then either (a) re-aggregate per host in a second phase for
   counters, or (b) keep salt in the key where per-host totality isn't
   needed. ``S`` scales with the host's frontier share so small hosts pay
   no extra shuffle width.

Per-host *counters* (lineage: fetched/deduped/deferred, A3) use classic
two-phase aggregation: partial count per (host, salt) — map-side combined —
then a cheap final sum per host over ≤S rows each.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame,
    salt_buckets: int,
    row_key_cols: Sequence[str],
    out_col: str = "salt",
) -> DataFrame:
    """Deterministic salt from the row's own key (never random — crawl
    determinism and replay require salts to be pure functions of data)."""
    return df.withColumn(
        out_col, F.pmod(F.xxhash64(*row_key_cols), F.lit(salt_buckets)).cast("int")
    )


def scaled_salt(
    df: DataFrame,
    host_col: str,
    row_key_cols: Sequence[str],
    rows_per_task: int = 1_000_000,
    max_salt: int = 1024,
    out_col: str = "salt",
) -> DataFrame:
    """Per-host salt width scaled to that host's row count: a host with n
    rows gets ceil(n / rows_per_task) salt values (capped). Small hosts get
    salt=0 everywhere — no shuffle blow-up; mega-forges fan out."""
    counts = df.groupBy(host_col).agg(F.count(F.lit(1)).alias("__n"))
    widths = counts.select(
        host_col,
        F.least(
            F.greatest(F.ceil(F.col("__n") / rows_per_task), F.lit(1)), F.lit(max_salt)
        )
        .cast("int")
        .alias("__width"),
    )
    return (
        df.join(F.broadcast(widths), host_col)
        .withColumn(
            out_col, F.pmod(F.xxhash64(*row_key_cols), F.col("__width")).cast("int")
        )
        .drop("__width")
    )


def two_phase_count(
    df: DataFrame,
    group_cols: Sequence[str],
    salt_col: str = "salt",
    count_col: str = "n",
) -> DataFrame:
    """count per group via partial-per-salt then final-per-group. The partial
    shuffle key (group, salt) spreads a hot group over S reducers; the final
    phase aggregates ≤S small rows per group."""
    partial = df.groupBy(*group_cols, salt_col).agg(F.count(F.lit(1)).alias("__partial"))
    return partial.groupBy(*group_cols).agg(F.sum("__partial").alias(count_col))
