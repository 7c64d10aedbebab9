"""Sequence packing and mixture sampling — the last mile of a pretraining
data pipeline.

``pack_sequences`` is GPT-style chunked concatenation: within each shard
(``group_col``), documents are laid end-to-end in a deterministic order and
the token stream is cut every ``context_len`` tokens; a document belongs to
the training sequence its FIRST token lands in. One window cumsum per shard
(a per-shard sort — exactly what a real packing job does, and the shard key
keeps any one sort partition bounded at 100 TB), then a hash aggregate.
No Python anywhere.

``mixture_sample`` applies a per-stratum token budget (the "data mixture"
step: e.g. 30% code, 40% English web, ...): one aggregate computes each
stratum's total tokens, the acceptance rate is ``min(1, target/total)``,
and acceptance itself is the deterministic Fibonacci-Weyl selector from
``operators/sampling.py`` — a pure scan predicate after a broadcast join
of the (tiny) per-stratum rate dim, so the sample is partition-invariant,
replayable, and oracle-checkable. Rates are materialized from doubles into
integer selector thresholds with the same truncation on both engines.

Reference note: forgeflux-org/starchart has no training-data layer; these
follow the public pretraining-pipeline recipes (fixed-context packing,
fixed mixture weights) mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from starchart_spark.operators import sampling, text


def pack_sequences(
    df: DataFrame,
    context_len: int = 2048,
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to its training sequence and aggregate per
    sequence: ``(group, seq_id, n_docs, n_tokens, first_doc_id,
    last_doc_id)``.

    ``seq_id = start_offset DIV context_len`` where ``start_offset`` is the
    document's first-token position in the shard's concatenated stream —
    integer arithmetic end-to-end (no double division: exact at any corpus
    size, and byte-identical in the SQL oracle via ``//``).
    """
    n_tok = text.token_count(F.col(text_col)).cast("long")
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_off = df.select(
        F.col(group_col),
        F.col(order_col),
        n_tok.alias("__n_tokens"),
    ).withColumn("__start_off", F.sum("__n_tokens").over(w) - F.col("__n_tokens"))
    return (
        with_off.withColumn(
            "seq_id", F.expr(f"__start_off DIV {int(context_len)}")
        )
        .groupBy(group_col, "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n_tokens").alias("n_tokens"),
            F.min(order_col).alias("first_doc_id"),
            F.max(order_col).alias("last_doc_id"),
        )
    )


def mixture_rates(
    df: DataFrame,
    targets: DataFrame,
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum acceptance rates for a token-budget mixture:
    ``(strata, total_tokens, target_tokens, rate)`` with
    ``rate = least(1.0, target_tokens / total_tokens)``.

    ``targets``: (strata_col, target_tokens long). Strata absent from
    ``targets`` get rate 0 (dropped from the mixture); empty strata keep
    rate 1. The output is a strata-sized dim — broadcast it.
    """
    totals = df.groupBy(strata_col).agg(
        F.sum(text.token_count(F.col(text_col)).cast("long")).alias("total_tokens")
    )
    return totals.join(targets, strata_col, "left").select(
        strata_col,
        "total_tokens",
        F.coalesce("target_tokens", F.lit(0)).cast("long").alias("target_tokens"),
        F.when(
            F.col("total_tokens") <= 0, F.lit(1.0)
        )
        .otherwise(
            F.least(
                F.lit(1.0),
                F.coalesce("target_tokens", F.lit(0)).cast("double")
                / F.col("total_tokens"),
            )
        )
        .alias("rate"),
    )


def mixture_sample(
    df: DataFrame,
    targets: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: int = 0,
) -> DataFrame:
    """Deterministically sample ``df`` down to the per-stratum token budget
    in ``targets``: two scans total (one aggregate for the rates, one
    filtered scan for the sample), one broadcast join, zero Python. The
    expected sampled token mass per stratum is ``min(target, total)``;
    the draw is partition-invariant and replayable (same selector, same
    salt → same corpus)."""
    rates = mixture_rates(df, targets, strata_col, text_col).select(
        strata_col,
        (F.col("rate") * sampling.P31).cast("long").alias("__thresh"),
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(sampling.selector(id_col, salt) < F.col("__thresh"))
        .drop("__thresh")
    )


def temperature_rates(
    df: DataFrame,
    alpha: float = 0.5,
    budget_tokens: int = 1_000_000,
    strata_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based mixture reweighting: per-stratum sampling
    probabilities ``p_i ∝ (total_tokens_i)^alpha`` and the acceptance
    rates that realize them under a global token budget —
    ``(strata, total_tokens, p, target_tokens, rate)``.

    This is the multilingual up/down-sampling rule from the public
    pretraining literature (Arivazhagan et al. 2019 temperature sampling,
    T = 1/alpha; XLM-R uses alpha = 0.3, mT5 alpha = 0.3, CCNet/XLM
    alpha ≈ 0.5-0.7): raw web-language mass is power-law skewed, and
    exponentiating the shares by ``alpha < 1`` flattens the mixture so
    tail languages are not drowned. ``mixture_rates`` above is the
    absolute-budget variant (you dictate per-stratum tokens);
    ``temperature_rates`` derives the per-stratum targets from ONE global
    budget and the corpus's own distribution.

    Determinism discipline: ``alpha = 0.5`` routes through ``sqrt`` —
    IEEE-754 correctly rounded in every engine, unlike ``pow`` whose last
    ulp is libm-specific — and ``p``/``rate`` are rounded to 6 decimals
    before they are emitted. ``target_tokens`` is recovered by rounding
    ``budget · p₆`` to the nearest integer: since ``p₆`` has 6 decimals
    the product is mathematically an integer whenever ``budget`` is a
    multiple of 10^6, so nearest-integer rounding erases the float
    representation error that a floor would trip over at integer
    boundaries. Shape: one hash aggregate + a strata-sized window — the
    output is a broadcast dim however large the corpus.
    """
    totals = df.groupBy(F.col(strata_col).alias("strata")).agg(
        F.sum(text.token_count(F.col(text_col)).cast("long")).alias(
            "total_tokens"
        )
    )
    if alpha == 0.5:
        w = F.sqrt(F.col("total_tokens").cast("double"))
    else:
        w = F.pow(F.col("total_tokens").cast("double"), float(alpha))
    weighted = totals.select("strata", "total_tokens", w.alias("__w"))
    p6 = F.round(
        F.col("__w") / F.sum("__w").over(Window.partitionBy()), 6
    )
    target = F.round(p6 * F.lit(int(budget_tokens)), 0).cast("long")
    rate = F.when(F.col("total_tokens") <= 0, F.lit(0.0)).otherwise(
        F.least(
            F.lit(1.0), target.cast("double") / F.col("total_tokens")
        )
    )
    return weighted.select(
        "strata",
        "total_tokens",
        p6.alias("p"),
        target.alias("target_tokens"),
        F.round(rate, 6).alias("rate"),
    )


def temperature_sample(
    df: DataFrame,
    alpha: float = 0.5,
    budget_tokens: int = 1_000_000,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: int = 0,
) -> DataFrame:
    """Deterministically sample ``df`` to the temperature-flattened
    mixture: rates from :func:`temperature_rates`, acceptance via the
    Fibonacci-Weyl selector (same contract as ``mixture_sample`` — two
    scans, one broadcast join, partition-invariant, replayable). The
    expected sampled token mass per stratum is
    ``min(budget · p, total)``; up-sampling (p demanding MORE than a
    stratum has) saturates at rate 1 — epoch repetition is the packer's
    job, not the sampler's."""
    rates = temperature_rates(
        df, alpha, budget_tokens, strata_col, text_col
    ).select(
        F.col("strata").alias(strata_col),
        (F.col("rate") * sampling.P31).cast("long").alias("__thresh"),
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(sampling.selector(id_col, salt) < F.col("__thresh"))
        .drop("__thresh")
    )
