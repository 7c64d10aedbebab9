"""Data selection for language-model pretraining: DSIR importance weights.

Implements the unigram form of Data Selection with Importance Resampling
(Xie et al., NeurIPS 2023): score every raw document by how much more
likely its tokens are under a small in-domain TARGET corpus than under the
RAW pool,

    w(doc) = Σ_{token occurrences t in doc}  ln p̂_target(t) − ln p̂_raw(t)

with add-``smoothing`` (Laplace) estimates over the raw vocabulary, so a
token absent from the target still gets finite mass. High-weight documents
"look like" the target domain; selection takes the top slice (the paper
gumbel-resamples — the deterministic top-k here keeps the operator
oracle-checkable; resampling is one extra rand column if wanted).

Spark-first shape (everything JVM-side, zero Python):
- ONE explode of the raw corpus feeds both the raw unigram counts and,
  filtered through the target membership, the target counts — token
  statistics are plain hash aggregates with map-side partials;
- the two count dims join on token, the scalar totals (N_raw, N_target,
  |V|) attach via a 1-row cross join (broadcast by construction), and the
  per-token log-ratio becomes a vocabulary-sized dim;
- per-document weights are a broadcast join of that dim onto the exploded
  tokens and one sum by doc_id.

100 TB notes: the vocabulary dim is the only scale risk — natural-language
unigram vocabularies are millions of rows (fits a broadcast), but
open-domain web text with typos/IDs is unbounded. The paper's fix is the
right Spark fix too: hash tokens into B buckets (``F.pmod(F.xxhash64(tok),
B)``) BEFORE counting, which caps the dim at B rows and keeps every
downstream step identical. This module keeps exact tokens so the DuckDB
oracle matches byte-for-byte; pass the exploded frame through a hash
projection to get the paper's hashed variant. Per-token logratios round to
6 dp, then per-doc sums run in exact integer micro-units (long) — double
addition ORDER differs between engines and was observed to flip a 6th
decimal on a boundary doc (lm_score); integer sums are order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, tok) — one row per token OCCURRENCE (weights sum over
    occurrences, not distinct types). Blank docs contribute nothing."""
    from starchart_spark.operators.text import ensure_min_partitions

    # spread before the explode (guide §2.5; no-op at scale)
    return (
        ensure_min_partitions(df.filter(F.trim(F.col(text_col)) != ""))
        .select(
            F.col(id_col),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
        )
    )


def dsir_logratios(
    raw_tokens: DataFrame,
    target_tokens: DataFrame,
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-token ``(tok, logratio)`` dim over the RAW vocabulary.

    logratio(t) = ln((c_t(t)+s)/(N_t+s·V)) − ln((c_r(t)+s)/(N_r+s·V)),
    V = |raw vocabulary|. Tokens outside the raw vocabulary are undefined
    by construction (they can't occur in a raw document being scored).
    Rounded to 6 dp so both engines agree bit-for-bit after their own
    libm ln()."""
    raw_counts = raw_tokens.groupBy("tok").agg(F.count("*").alias("c_raw"))
    tgt_counts = target_tokens.groupBy("tok").agg(F.count("*").alias("c_tgt"))
    totals = (
        raw_counts.agg(
            F.sum("c_raw").alias("n_raw"), F.count("*").alias("v")
        )
        .crossJoin(target_tokens.agg(F.count("*").alias("n_tgt")))
    )
    s = F.lit(float(smoothing))
    joined = (
        raw_counts.join(tgt_counts, "tok", "left")
        .withColumn("c_tgt", F.coalesce(F.col("c_tgt"), F.lit(0)))
        .crossJoin(F.broadcast(totals))
    )
    logratio = F.round(
        F.log((F.col("c_tgt") + s) / (F.col("n_tgt") + s * F.col("v")))
        - F.log((F.col("c_raw") + s) / (F.col("n_raw") + s * F.col("v"))),
        6,
    )
    return joined.select("tok", logratio.alias("logratio"))


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
) -> DataFrame:
    """``(id, weight)`` for every non-blank raw document: the summed
    log-likelihood ratio of its token occurrences, target vs raw."""
    raw_toks = _tokens(raw, text_col, id_col)
    tgt_toks = _tokens(target, text_col, id_col)
    lr = dsir_logratios(raw_toks, tgt_toks, smoothing)
    return (
        raw_toks.join(F.broadcast(lr), "tok")
        .groupBy(id_col)
        # exact integer micro-units: logratio is already 6-dp-rounded, so
        # round(logratio*1e6) is its canonical integer; long sums are
        # order-independent where double sums can flip the 6th decimal
        # between engines (observed on lm_score).
        .agg(
            F.round(
                F.sum(F.round(F.col("logratio") * F.lit(1e6)).cast("long"))
                / F.lit(1e6),
                6,
            ).alias("weight")
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
) -> DataFrame:
    """Deterministic top-``k`` raw documents by importance weight
    (ties broken by id so reruns select the same set). Global top-k is a
    TakeOrderedAndProject physical plan — no full sort, no single-partition
    window, safe at any corpus size for the k values selection uses."""
    w = dsir_weights(raw, target, text_col, id_col, smoothing)
    return w.orderBy(F.col("weight").desc(), F.col(id_col).asc()).limit(k)
