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


def positional_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, tok, pos) — positional postings (1-based), ONE posexplode.
    The positional extension of bm25_scores' tf postings: what phrase and
    proximity queries consume."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), F.posexplode(toks).alias("__p0", "tok"))
        .select(id_col, "tok", (F.col("__p0") + 1).alias("pos"))
    )


def phrase_search(
    df: DataFrame,
    phrase: list[str] | str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, start_pos) — every occurrence of the exact token phrase, the
    classic positional-index anchor join (overlap-correct, unlike regex
    replace counting: 'a a a' contains 'a a' TWICE):

    - postings filter to the phrase vocabulary via a broadcast (idx, term)
      dim — a k-term phrase keeps k rows per matching position, repeated
      terms included;
    - a posting for term idx at position p votes for anchor ``p − idx``;
      a true occurrence at start s collects ALL k distinct idx votes at
      anchor s — one (doc, anchor) aggregate decides.

    ONE posexplode + ONE broadcast join + ONE aggregate; the shuffle
    carries only phrase-vocabulary postings (web-scale: tiny unless the
    phrase is all stopwords, the same caveat every positional index has).
    """
    terms = phrase.split() if isinstance(phrase, str) else list(phrase)
    if not terms:
        raise ValueError("phrase_search needs a non-empty phrase")
    k = len(terms)
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(i, t) for i, t in enumerate(terms)], "idx int, term string"
    )
    hits = positional_postings(df, id_col, text_col).join(
        F.broadcast(dim), F.col("tok") == F.col("term")
    )
    return (
        hits.select(id_col, (F.col("pos") - F.col("idx")).alias("start_pos"), "idx")
        .groupBy(id_col, "start_pos")
        .agg(F.count_distinct("idx").alias("__nidx"))
        .filter((F.col("__nidx") == k) & (F.col("start_pos") >= 1))
        .select(id_col, "start_pos")
    )


def proximity_search(
    df: DataFrame,
    terms: list[str] | str,
    window: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, best_span) — docs where ALL ``terms`` co-occur within a token
    window of ≤ ``window`` (the NEAR/k operator beside phrase_search's
    exact adjacency; ``best_span`` is the doc's tightest such window in
    tokens, inclusive).

    The classic minimal-window sweep, relationally: postings filter to
    the query vocabulary (broadcast dim), then per doc in position order
    each hit carries a CONDITIONAL RUNNING MAX per term (the latest
    position of that term at-or-before here — k window columns over ONE
    doc-keyed sort exchange); the window ending at this hit spans
    ``pos − least(latest_1..k) + 1``, and the per-doc MIN of that is the
    tightest co-occurrence. Duplicate query terms collapse (NEAR
    semantics need each DISTINCT term once).
    """
    from pyspark.sql import Window as W

    tlist = sorted(set(terms.split() if isinstance(terms, str) else terms))
    if not tlist:
        raise ValueError("proximity_search needs a non-empty term set")
    hits = positional_postings(df, id_col, text_col).filter(
        F.col("tok").isin(tlist)
    )
    w = (
        W.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    latest = [
        F.max(F.when(F.col("tok") == t, F.col("pos"))).over(w).alias(f"__l{i}")
        for i, t in enumerate(tlist)
    ]
    # NB: least() SKIPS nulls (returns null only when all args are) — the
    # span must gate on every term having appeared, or the first hit of
    # any doc scores a bogus span of 1
    cols = [F.col(f"__l{i}") for i in range(len(tlist))]
    all_seen = cols[0].isNotNull()
    for c in cols[1:]:
        all_seen = all_seen & c.isNotNull()
    spanned = hits.select(id_col, "pos", *latest).withColumn(
        "__span",
        F.when(all_seen, F.col("pos") - F.least(*cols) + 1),
    )
    return (
        spanned.filter(F.col("__span").isNotNull())
        .groupBy(id_col)
        .agg(F.min("__span").alias("best_span"))
        .filter(F.col("best_span") <= window)
    )
