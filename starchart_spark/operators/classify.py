"""Multinomial Naive Bayes text classification — the quality-filter role.

Web-scale curation pipelines (CCNet, GPT-3/WebText, RefinedWeb) gate
documents with a cheap linear text classifier — fastText or logistic
regression over bag-of-words — trained to separate "looks like the
reference corpus" from "random crawl". Multinomial NB is the
closed-form member of that family: training is pure counting, so the
whole operator (train AND score) stays a declarative Spark plan with a
byte-exact DuckDB oracle — no SGD, no iteration, no nondeterminism.

    score(doc, c) = ln p(c) + Σ_{token occurrences t} ln p̂(t|c),
    p̂(t|c) = (count(t, c) + a) / (N_c + a·V)

with add-``a`` smoothing over the training vocabulary V; tokens unseen
for a class fall to the smoothing floor ln(a/(N_c + a·V)) via a left
join. Prediction is the argmax class with ties broken by label
(ascending), so reruns are bit-stable.

Spark-first shape (all JVM, zero Python):
- ONE explode of the labeled corpus feeds the (token, class) counts;
  per-class totals and the vocabulary size derive FROM that dim (two
  tiny aggregates), so the model is consistent by construction;
- scoring joins doc token occurrences to the class dim (a broadcast
  cross join over the handful of classes) and the per-(tok, class)
  log-likelihood dim, then sums per (doc, class);
- all log terms round to 6 dp and sum in exact integer micro-nats
  (long), so double-addition ORDER can never flip a rounded digit
  between engines (the lm_score lesson).

100 TB notes: the model dim is |vocab|·|classes| rows — broadcast for
real vocabularies; hash tokens into B buckets before counting (same
move as DSIR) if the tail vocabulary is unbounded. Scoring is one
explode + one broadcast join + one hash aggregate: map-side partials,
a single exchange on doc_id, then a K-row-per-doc argmax.

Reference role: the fastText quality gate of CCNet (Wenzek et al.
2020) / GPT-3's WebText classifier (Brown et al. 2020 appendix A).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_U = 1e6  # micro-nat fixed-point scale


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, tok) — one row per token OCCURRENCE (multinomial NB counts
    occurrences, not distinct types). Blank docs contribute nothing."""
    return df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )


def nb_train(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """Train on a labeled corpus; returns ``(model, classes)``.

    ``model``: (tok, label, ll_u) — per-(token, class) log-likelihood in
    integer micro-nats, only for SEEN pairs (unseen pairs take the
    class floor at scoring time).
    ``classes``: (label, prior_u, floor_u) — log-prior and the unseen-
    token floor per class, micro-nats. Both are dims: vocabulary-sized
    and K-sized respectively; scoring broadcasts them.
    """
    # carry the label THROUGH the explode — the previous shape exploded
    # first and joined the label back on doc_id, a pointless join probing
    # every token occurrence (guide §2.4)
    toks = labeled.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col),
        F.col(label_col).alias("label"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    counts = toks.groupBy("tok", "label").agg(F.count("*").alias("c"))
    class_totals = counts.groupBy("label").agg(F.sum("c").alias("n_c"))
    vocab = counts.agg(F.count_distinct("tok").alias("v"))
    docs_per_class = (
        labeled.filter(F.trim(F.col(text_col)) != "")
        .groupBy(F.col(label_col).alias("label"))
        .agg(F.count("*").alias("n_docs"))
    )
    n_docs_total = docs_per_class.agg(F.sum("n_docs").alias("n_total"))
    s = F.lit(float(smoothing))
    u = F.lit(_U)
    model = (
        counts.join(class_totals, "label")
        .crossJoin(F.broadcast(vocab))
        .select(
            "tok",
            "label",
            F.round(
                F.log((F.col("c") + s) / (F.col("n_c") + s * F.col("v"))) * u
            )
            .cast("long")
            .alias("ll_u"),
        )
    )
    classes = (
        docs_per_class.crossJoin(F.broadcast(n_docs_total))
        .join(class_totals, "label")
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            F.round(F.log(F.col("n_docs") / F.col("n_total")) * u)
            .cast("long")
            .alias("prior_u"),
            F.round(F.log(s / (F.col("n_c") + s * F.col("v"))) * u)
            .cast("long")
            .alias("floor_u"),
        )
    )
    return model, classes


def nb_score(
    df: DataFrame,
    model: DataFrame,
    classes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, label, score) — posterior log-score of EVERY class for every
    non-blank document.

    Exact floor-delta decomposition (all integer micro-nats, so this is an
    identity, not an approximation):

        Σ_occ coalesce(ll, floor_c) = n_tokens·floor_c + Σ_seen (ll − floor_c)

    which turns the old K-class CROSS join over every token occurrence
    (|occurrences|·K probe rows) into ONE inner broadcast join that only
    materializes the (occurrence, class) pairs the model has actually seen
    — typically ≈1 class per token instead of K (guide §2.3 shuffle/probe
    fewer rows). n_tokens comes from size(split(...)) in the scan
    projection: no explode, no exchange."""
    toks = _tokens(df, text_col, id_col)
    # per-(tok, class) delta above the class floor, built on the K-sized
    # dim at plan time
    dim = model.join(classes.select("label", "floor_u"), "label").select(
        "tok", "label", (F.col("ll_u") - F.col("floor_u")).alias("__delta")
    )
    msum = (
        toks.join(F.broadcast(dim), "tok")
        .groupBy(id_col, "label")
        .agg(F.sum("__delta").alias("__m"))
    )
    base = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col),
            F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("__n"),
        )
        .crossJoin(F.broadcast(classes))
    )
    scored = base.join(msum, [id_col, "label"], "left").select(
        F.col(id_col),
        "label",
        (
            F.col("prior_u")
            + F.col("__n").cast("long") * F.col("floor_u")
            + F.coalesce(F.col("__m"), F.lit(0))
        ).alias("score_u"),
    )
    return scored.select(
        id_col,
        "label",
        F.round(F.col("score_u") / F.lit(_U), 6).alias("score"),
    )


def nb_classify(
    df: DataFrame,
    model: DataFrame,
    classes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, predicted, score) — argmax class per document, ties broken by
    label ascending (deterministic). The rank runs over the K-row-per-doc
    score frame, so the window is tiny regardless of corpus size."""
    scored = nb_score(df, model, classes, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, F.col("label").alias("predicted"), "score")
    )
