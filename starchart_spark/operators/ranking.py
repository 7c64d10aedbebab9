"""BM25 ranking — relevance-scored full-text retrieval over a corpus.

`crawl/search.py` gives the reference's FTS surface (match + hydrate);
this module adds the scored form a corpus-scale pipeline needs: BM25
(Robertson/Spärck Jones; the Lucene variant of the idf) over
whitespace tokens, entirely as declarative aggregates.

    score(d, Q) = Σ_{t ∈ Q} idf(t) · f(t,d)·(k1+1)
                              / (f(t,d) + k1·(1 − b + b·|d|/avgdl))
    idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

Spark-first shape: ONE explode feeds (doc, tok) term frequencies and
doc lengths in a single aggregate; document frequencies and the scalar
(N, avgdl) derive from that frame; the query is a tiny broadcast dim so
only matching term rows survive the join — the corpus-wide explode
never re-materializes per query. Per-doc score sums run in exact
integer micro-units (the lm_score lesson: double-addition order is
engine-dependent at the 6th decimal).

100 TB notes: everything is hash aggregates with map-side partials +
one broadcast join on tok; the only exchange keyed on doc id carries
|Q| rows per matching doc. Top-k is TakeOrderedAndProject — no global
sort. For a standing query workload, persist the (tok → df) dim and
the (doc, tok, tf, dl) posting frame once (they are the inverted
index) and reuse across queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_U = 1e6


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, score) for every document matching ≥1 query term."""
    spark = df.sparkSession
    toks = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    postings = toks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    doclen = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = doclen.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    )
    q = spark.createDataFrame([(t,) for t in query_terms], ["tok"]).distinct()
    dfreq = (
        postings.join(F.broadcast(q), "tok")
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "tok",
        F.round(
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
            6,
        ).alias("idf"),
    )
    k1c, bc = F.lit(float(k1)), F.lit(float(b))
    term = (
        postings.join(F.broadcast(idf), "tok")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("avgdl", F.col("total_len") / F.col("n_docs"))
        .withColumn(
            "term_u",
            F.round(
                F.col("idf")
                * (F.col("tf") * (k1c + F.lit(1.0)))
                / (
                    F.col("tf")
                    + k1c
                    * (F.lit(1.0) - bc + bc * F.col("dl") / F.col("avgdl"))
                )
                * F.lit(_U)
            ).cast("long"),
        )
    )
    return term.groupBy(id_col).agg(
        F.round(F.sum("term_u") / F.lit(_U), 6).alias("score")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic top-``k`` by (score desc, id asc) —
    TakeOrderedAndProject, no global sort."""
    scores = bm25_scores(df, query_terms, k1, b, text_col, id_col)
    return scores.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
