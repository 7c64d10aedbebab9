"""Temporal joins Spark lacks natively: as-of join and range join.

Two classic event-pipeline operators with no built-in DataFrame form:

- :func:`asof_join` — for every left row, the latest right row with
  ``right.ts <= left.ts`` for the same key (market-data "last quote
  before the trade", attribution "last view before the purchase").
  Naive formulations are per-key loops or inequality joins; the
  Spark-first form is the UNION + running-``last(ignorenulls)`` window:
  tag both sides, sort each key's timeline once, and carry the most
  recent right payload forward. ONE shuffle + sort per key — the same
  cost as a groupBy — and no Python. Ordering is (ts, side, right-id)
  with the right side first at equal ts, so a right row stamped exactly
  at the left ts matches (inclusive) and ties resolve to the largest
  right id — bit-stable under any partitioning.

- :func:`range_join` — ``left.point ∈ [right.start, right.end)`` for
  the same key. The naive plan is a broadcast-nested-loop inequality
  join (quadratic per key). The scale form buckets time: each interval
  explodes to the fixed-width buckets it covers, each point computes
  its bucket, and the join becomes an EQUI-join on (key, bucket) with
  the exact containment predicate as a post-filter. Every (point,
  interval) pair meets in exactly one bucket — the point's — so no
  dedup pass is needed. Bucket width trades replication (long intervals
  explode to many buckets) against join selectivity; pick it near the
  median interval length.

100 TB notes: asof_join's window is rows-unbounded-preceding running
state — Spark evaluates it streamingly within each key's sorted run, no
buffering of the timeline. Skewed keys behave like any other sort-
window; salt the key if one entity dominates. range_join's exploded
interval table grows by len/width per row — ``bucket_width`` is the
knob, and the equi-join shuffles narrow (key, bucket) rows that AQE can
re-balance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_ts_col: str | None = None,
    right_id_col: str | None = None,
    tolerance_ms: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the most recent ``right``
    row at-or-before its timestamp (per ``on`` key), or NULLs if none.

    Right columns (except the key) come back suffixed. ``right_id_col``
    breaks ties among right rows sharing a timestamp (largest id wins) —
    pass it whenever right timestamps can collide, or matches there are
    partitioning-dependent. ``tolerance_ms`` nulls matches staler than
    the window (the pandas ``merge_asof`` tolerance semantic).
    Timestamp columns compare as epoch millis; numeric columns as-is.
    """
    rts = right_ts_col or ts_col
    r_payload = [c for c in right.columns if c != on]

    def as_num(df: DataFrame, name: str):
        if dict(df.dtypes)[name].startswith("timestamp"):
            return F.unix_millis(F.col(name).cast("timestamp"))
        return F.col(name).cast("long")

    l_struct_t = left.select(F.struct(*left.columns).alias("s")).schema[
        "s"
    ].dataType
    r_struct_t = right.select(F.struct(*r_payload).alias("s")).schema[
        "s"
    ].dataType
    tie = (
        F.col(right_id_col).cast("long")
        if right_id_col
        else F.lit(0).cast("long")
    )
    l_tagged = left.select(
        F.col(on).alias("__k"),
        as_num(left, ts_col).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(r_struct_t).alias("__r"),
        F.lit(None).cast("long").alias("__rid"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        as_num(right, rts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_struct_t).alias("__l"),
        F.struct(*r_payload).alias("__r"),
        tie.alias("__rid"),
    )
    # right rows sort BEFORE left rows at equal ts (inclusive match);
    # equal-ts right rows resolve to the largest tie-break id
    w = (
        Window.partitionBy("__k")
        .orderBy(
            F.col("__t").asc(), F.col("__is_left").asc(), F.col("__rid").asc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .withColumn(
            "__match_t",
            F.last(
                F.when(F.col("__is_left") == 0, F.col("__t")), ignorenulls=True
            ).over(w),
        )
        .filter(F.col("__is_left") == 1)
    )
    if tolerance_ms is not None:
        stale = F.col("__match_t") < F.col("__t") - F.lit(int(tolerance_ms))
        carried = carried.withColumn(
            "__match", F.when(stale, F.lit(None)).otherwise(F.col("__match"))
        )
    out_cols = [F.col("__l")[c].alias(c) for c in left.columns] + [
        F.col("__match")[c].alias(c + suffix) for c in r_payload
    ]
    return carried.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join of points into half-open intervals ``[start, end)``
    sharing the ``on`` key, as an equi-join on (key, time-bucket).

    ``point_col``/``start_col``/``end_col`` are numeric (epoch ms or any
    monotone unit); ``bucket_width`` is in the same unit. Returns all
    left columns plus all right columns (key deduplicated).
    """
    wdt = F.lit(int(bucket_width))
    # empty intervals match nothing — and must not reach sequence(), which
    # would otherwise generate a DESCENDING bucket range for end < start
    right = right.filter(F.col(end_col) > F.col(start_col))
    exploded = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / wdt),
                # end is exclusive: a zero-length or boundary-aligned
                # interval must not leak into the next bucket
                F.floor((F.col(end_col) - F.lit(1)) / wdt),
            )
        ),
    )
    pointed = left.withColumn("__b", F.floor(F.col(point_col) / wdt))
    r_cols = [c for c in right.columns if c != on]
    joined = pointed.join(exploded, [on, "__b"]).filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )
    return joined.select(*left.columns, *r_cols)
