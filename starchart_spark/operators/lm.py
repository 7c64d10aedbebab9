"""Corpus-trained n-gram LM scoring: the CCNet quality signal.

CCNet (Wenzek et al. 2020) scores every document with a KenLM 5-gram
perplexity and buckets per language on that score. This module is the
Spark-native form of that signal with a bigram model trained ON the corpus
itself (or any reference corpus passed in): per-document cross-entropy

    ce(doc) = − (1/B) Σ_{bigrams (v,w) in doc} ln p̂(w|v),
    p̂(w|v) = (c(v,w) + a) / (c(v,·) + a·V)

with add-``a`` smoothing over the corpus vocabulary V. Lower is more
fluent under the reference corpus — feed it to
``curation.percentile_buckets(score_col="ce", by_col=lang)`` for the full
CCNet head/middle/tail split.

Spark-first shape, all JVM:
- bigrams come out of ONE explode per use (``text.sliding_ngrams``
  zip_with-over-slices windows — O(tokens)/doc, shared with dedup_text
  shingling and substrings gram windows);
- the model is two aggregates: bigram counts, and the context totals
  c(v,·) derived FROM the bigram dim (one more tiny aggregate), so the
  two are consistent by construction;
- scoring joins doc bigrams to the probability dim on the bigram key.
  The dim is vocabulary²-bounded but corpus-sparsity-sized in practice;
  Spark's planner broadcasts it when it fits and shuffle-joins otherwise
  — both correct, and AQE picks per-run. At open-web scale the KenLM move
  applies: prune counts < k (a HAVING floor) and let pruned bigrams fall
  into the smoothing term via the left join.

Determinism for the oracle: ln() per bigram rounded to 6 dp, then the
per-doc sum runs in exact integer micro-nats (round(logp*1e6) as long) so
double-addition ORDER can never flip the final rounded digit — the only
remaining fp ops (/1e6, /n) act on bit-identical inputs in every engine.
(A pure-double sum was observed to flip the 6th decimal on one doc in 500
at sf0.01: summation order differs between Spark and DuckDB.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, bigram) — one row per bigram OCCURRENCE, ``"v w"`` string keys
    (the same join-key shape as dedup_text shingles). Docs with < 2 tokens
    have no bigrams and drop out here. Windows build via
    ``text.sliding_ngrams`` (zip_with over slices — O(tokens)/doc; a
    transform+element_at lambda re-splits per element, O(tokens²)/doc)."""
    from starchart_spark.operators import text as text_ops

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        text_ops.ensure_min_partitions(
            df.filter(F.trim(F.col(text_col)) != "").filter(F.size(toks) >= 2)
        )
        .select(
            F.col(id_col),
            F.explode(text_ops.sliding_ngrams(toks, 2)).alias("bigram"),
        )
    )


def bigram_model(
    corpus_bigrams: DataFrame,
    vocab_size_df: DataFrame,
    smoothing: float = 0.5,
    min_count: int = 1,
) -> DataFrame:
    """``(bigram, logp)`` — smoothed conditional log-probabilities.

    ``vocab_size_df`` is a 1-row (v) frame (corpus distinct-token count);
    it cross-joins (broadcast by construction) rather than collecting, so
    model building stays a pure plan. ``min_count`` > 1 is the KenLM-style
    prune: rarer bigrams are dropped from the dim and score as unseen."""
    counts = (
        corpus_bigrams.groupBy("bigram")
        .agg(F.count("*").alias("c_bg"))
        .filter(F.col("c_bg") >= min_count)
    )
    ctx = (
        counts.withColumn("ctx", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .groupBy("ctx")
        .agg(F.sum("c_bg").alias("c_ctx"))
    )
    s = F.lit(float(smoothing))
    return (
        counts.withColumn("ctx", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .join(ctx, "ctx")
        .crossJoin(F.broadcast(vocab_size_df))
        .select(
            "bigram",
            F.round(
                F.log((F.col("c_bg") + s) / (F.col("c_ctx") + s * F.col("v"))), 6
            ).alias("logp"),
        )
    )


def kn_model(
    corpus_bigrams: DataFrame, discount: float = 0.75
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Interpolated Kneser–Ney bigram model (the smoothing KenLM actually
    ships, Kneser & Ney 1995 / Chen & Goodman 1999) as four count dims:

    - ``pairs``  (bigram, c_bg)                — bigram occurrence counts
    - ``ctx``    (v, c_ctx, n_follow)          — context total + distinct
      followers N1+(v·), the interpolation-weight numerator
    - ``cont``   (w, n_prec)                   — distinct predecessors
      N1+(·w), the continuation-count numerator
    - ``npp``    1-row (npp)                   — distinct bigram TYPES
      N1+(··), the continuation denominator

        P_KN(w|v) = (c(v,w) − D)/c(v·) + (D·N1+(v·)/c(v·)) · N1+(·w)/N1+(··)

    Everything is counting — two aggregates over the bigram dim plus one
    over its two key projections — so the model verifies against a pure
    SQL oracle (no training loop, no floats until the final ln). The
    bigram dim is corpus-sparsity-sized; at open-web scale the same KenLM
    prune as :func:`bigram_model` applies upstream (drop c_bg < k rows
    BEFORE this call and the pruned mass falls into the backoff branch)."""
    # the four returned dims ALL derive from this aggregate; checkpoint it
    # once or every consumer re-runs the corpus bigram explode + count
    # (guide §2.4 — the graph-edges lesson)
    counts = (
        corpus_bigrams.groupBy("bigram")
        .agg(F.count("*").alias("c_bg"))
        .localCheckpoint(eager=True)
    )
    v = F.split_part(F.col("bigram"), F.lit(" "), F.lit(1))
    w = F.split_part(F.col("bigram"), F.lit(" "), F.lit(2))
    ctx = counts.groupBy(v.alias("v")).agg(
        F.sum("c_bg").alias("c_ctx"), F.count("*").alias("n_follow")
    )
    cont = counts.groupBy(w.alias("w")).agg(F.count("*").alias("n_prec"))
    npp = counts.agg(F.count("*").alias("npp"))
    return counts, ctx, cont, npp


def kn_cross_entropy(
    df: DataFrame,
    pairs: DataFrame,
    ctx: DataFrame,
    cont: DataFrame,
    npp: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """``(id, n_bigrams, ce)`` — per-document cross-entropy under a
    Kneser–Ney bigram model from :func:`kn_model` (typically trained on a
    held-out / reference corpus, so scored docs DO hit unseen events).

    Per-bigram probability, by what the model has seen:

    - bigram seen:  the full interpolated P_KN (docstring of
      :func:`kn_model`);
    - only the context ``v`` seen:  the interpolation term alone,
      (D·N1+(v·)/c(v·)) · P_cont(w);
    - ``v`` unseen:  the lower-order distribution P_cont(w) by itself
      (standard back-off-to-lower-order, there is no weight to scale by);
    - where P_cont needs an unseen ``w``:  the documented floor D/N1+(··)
      (a fractional continuation type — keeps every branch strictly
      positive and engine-replayable).

    Plan: doc bigrams left-join three narrow dims (pair counts on the
    bigram key, context stats on v, continuation counts on w — Spark
    broadcasts each when it fits) + a broadcast 1-row cross join for the
    denominator; per-bigram ln is 6-dp-rounded and summed in exact integer
    micro-nats (same order-independence discipline as
    :func:`lm_cross_entropy`, see module docstring)."""
    d = F.lit(float(discount))
    doc_bg = _doc_bigrams(df, text_col, id_col)
    scored = (
        doc_bg.withColumn("v", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .withColumn("w", F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)))
        .join(pairs, "bigram", "left")
        .join(ctx, "v", "left")
        .join(cont, "w", "left")
        .crossJoin(F.broadcast(npp))
    )
    pcont = F.coalesce(F.col("n_prec").cast("double"), d) / F.col("npp")
    p = (
        F.when(
            F.col("c_bg").isNotNull(),
            (F.col("c_bg") - d) / F.col("c_ctx")
            + (d * F.col("n_follow") / F.col("c_ctx")) * pcont,
        )
        .when(
            F.col("c_ctx").isNotNull(),
            (d * F.col("n_follow") / F.col("c_ctx")) * pcont,
        )
        .otherwise(pcont)
    )
    return (
        scored.withColumn("logp", F.round(F.log(p), 6))
        .withColumn("logp_u", F.round(F.col("logp") * F.lit(1e6)).cast("long"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                -(F.sum("logp_u") / F.lit(1e6)) / F.count("*"), 6
            ).alias("ce"),
        )
    )


def lm_cross_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
    min_count: int = 1,
    model: DataFrame | None = None,
    vocab_size_df: DataFrame | None = None,
) -> DataFrame:
    """``(id, n_bigrams, ce)`` — per-document bigram cross-entropy under a
    model trained on ``df`` itself (CCNet trains on curated Wikipedia;
    pass ``model`` + ``vocab_size_df`` from :func:`bigram_model` over a
    reference corpus for that form). Docs with < 2 tokens are absent.

    Unseen bigrams (possible when ``model`` comes from another corpus or
    ``min_count`` pruned them) score the smoothing floor
    ln(a / (a·V)) = −ln V, via the left join's coalesce."""
    doc_bg = _doc_bigrams(df, text_col, id_col)
    if vocab_size_df is None:
        toks = F.split(F.trim(F.col(text_col)), r"\s+")
        vocab_size_df = (
            df.filter(F.trim(F.col(text_col)) != "")
            .select(F.explode(toks).alias("tok"))
            .agg(F.count_distinct("tok").alias("v"))
        )
    if model is None:
        model = bigram_model(doc_bg, vocab_size_df, smoothing, min_count)
    floor = F.round(-F.log(F.col("v").cast("double")), 6)
    return (
        doc_bg.join(model, "bigram", "left")
        .crossJoin(F.broadcast(vocab_size_df))
        .withColumn("logp", F.coalesce(F.col("logp"), floor))
        # exact integer micro-nats: logp is already 6-dp-rounded, so
        # round(logp*1e6) is its canonical integer; long sums are
        # order-independent, unlike double sums (see module docstring).
        .withColumn("logp_u", F.round(F.col("logp") * F.lit(1e6)).cast("long"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                -(F.sum("logp_u") / F.lit(1e6)) / F.count("*"), 6
            ).alias("ce"),
        )
    )
