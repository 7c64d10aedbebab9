"""Content-defined chunking (CDC) dedup — the variable-boundary rung of
the dedup ladder.

Fixed-size chunks break on insertion: one added token shifts every later
boundary and nothing downstream matches again. Content-defined chunking
(LBFS, Muthitacharoen et al. SOSP 2001; FastCDC, Xia et al. ATC 2016)
puts boundaries where the CONTENT says — a rolling window hash hitting a
divisor condition — so an edit only perturbs chunks up to the next
surviving boundary and everything after still deduplicates. That is the
property object stores and training-corpus delta pipelines pay for.

Token-level form over the corpus (the repo's dedup ladder is token-based
throughout): a chunk boundary falls BEFORE token ``i`` (i > 1) when the
k-token gram hash starting at ``i`` satisfies ``gh % divisor == 0``.
Expected chunk length ≈ ``divisor`` tokens. The last k−1 token positions
cannot host a boundary (their gram is incomplete) — the tail folds into
the final chunk, the same end-suppression real CDC implementations apply.

Spark-first shape, per doc (skewless — docs are bounded, there is no
mega-doc):

- ONE posexplode + ONE doc-keyed window pass computes gram hashes
  (lead() over the token stream — the winnow.py plan, no HOF re-eval),
  boundary flags, and chunk ids (a window cumsum of the flags);
- chunk reassembly is ``array_sort(collect_list(struct(pos, tok)))`` per
  (doc, chunk) — the vocab.py order-preserving aggregate;
- duplicate marking is one hash-keyed window (first occurrence by
  (doc, chunk) stays, the exact_dedup keep-first rule).

``portable=True`` swaps xxhash64 gram identity for the arithmetic
polynomial the DuckDB oracle replays exactly (winnow.py's dual-mode
discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from starchart_spark.operators.text import FP_MOD, FP_MULT, ensure_min_partitions
from starchart_spark.operators.winnow import _portable_token_value


def chunk_tokens(
    df: DataFrame,
    k: int = 3,
    divisor: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    portable: bool = False,
) -> DataFrame:
    """(id, chunk_id, start_pos, n_tokens, chunk_text) — content-defined
    chunks; ``chunk_id`` is 0-based per doc, positions 1-based, chunks
    partition the token stream exactly (Σ n_tokens == doc token count)."""
    if k < 1 or divisor < 1:
        raise ValueError("k and divisor must be >= 1")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # spread before the explode: a single-file scan would run the whole
    # per-token stage on one task (no-op at scale — guide §2.5)
    pos_tok = (
        ensure_min_partitions(df.filter(F.length(F.trim(F.col(text_col))) > 0))
        .select(F.col(id_col).alias("__id"), toks.alias("__t"))
        .select("__id", F.posexplode("__t").alias("__p0", "__tok"))
        .select("__id", (F.col("__p0") + 1).alias("pos"), "__tok")
    )
    order = Window.partitionBy("__id").orderBy("pos")
    if portable:
        base = pos_tok.withColumn(
            "__tv", _portable_token_value(F.col("__tok")).cast("long")
        )
        coeffs = [pow(FP_MULT, k - 1 - j, FP_MOD) for j in range(k)]
        gh = None
        for j, c in enumerate(coeffs):
            term = (F.lead("__tv", j).over(order) * F.lit(c)) % FP_MOD
            gh = term if gh is None else (gh + term)
        gh = gh % FP_MOD
        complete = F.lead("__tv", k - 1).over(order).isNotNull()
    else:
        base = pos_tok
        gram_str = F.concat_ws(
            " ", *[F.lead("__tok", j).over(order) for j in range(k)]
        )
        gh = F.pmod(F.xxhash64(gram_str), F.lit(FP_MOD))
        complete = F.lead("__tok", k - 1).over(order).isNotNull()
    flagged = base.withColumn(
        "__bnd",
        (
            (F.col("pos") > 1)
            & complete
            & (gh % F.lit(divisor) == 0)
        ).cast("int"),
    )
    chunked = flagged.withColumn(
        "chunk_id",
        F.sum("__bnd").over(order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        chunked.groupBy("__id", "chunk_id")
        .agg(
            F.min("pos").alias("start_pos"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("__tok")))
                    ),
                    lambda s: s["__tok"],
                ),
            ).alias("chunk_text"),
        )
        .select(
            F.col("__id").alias(id_col),
            "chunk_id",
            "start_pos",
            "n_tokens",
            "chunk_text",
        )
    )


def mark_duplicate_chunks(
    chunks: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Adds ``is_dup``: every occurrence of a chunk text except the first
    by (doc, chunk_id) order — the exact_dedup keep-first rule at chunk
    granularity. One chunk-key window exchange; the shuffle carries chunk
    hashes and counters, with chunk_text reduced to its xxhash64 key
    upstream at scale (callers project it away)."""
    w = Window.partitionBy("chunk_text").orderBy(id_col, "chunk_id")
    return chunks.withColumn(
        "is_dup", (F.row_number().over(w) > 1)
    )


def doc_dup_stats(chunks: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-doc CDC dedup stats: (id, n_chunks, n_tokens, dup_tokens,
    dup_ratio) — dup_ratio rounded to 6 dp from exact long sums (one
    division, bit-identical cross-engine)."""
    marked = mark_duplicate_chunks(chunks, id_col)
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("is_dup"), F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("dup_tokens"),
        )
        .withColumn(
            "dup_ratio",
            F.round(F.col("dup_tokens") / F.col("n_tokens"), 6),
        )
    )
