"""Inbound anchor-text aggregation — what the web SAYS a host is about.

Anchor text on inbound links is the classic off-page relevance signal
(it predates and feeds PageRank-era ranking): the terms other sites use
when linking to a host describe it better than the host describes
itself, and a frontier scheduler uses the per-host term profile to
prioritize topic-targeted crawls (the reference's mini-index serves the
same "which instance is about X" question for federation search,
federate/federate-core — this is that signal generalized to the link
graph).

Spam resistance is structural, not heuristic: a term's weight is the
number of DISTINCT linking hosts that use it, so one link farm
repeating "cheap pills" a million times counts exactly once. The
distinct runs on (src, dst, term) — narrow rows — and collapses
map-side before its one exchange.

Scale shape: tokenize → per-edge distinct → (dst, term) count →
per-dst top-k. Tokenization is pure JVM (lower / regexp_replace /
split inside codegen). The top-k uses :func:`skew.ranked_by_host`, the
two-pass range-partition ranker, because a mega-host's term list (its
whole inbound vocabulary) must never sort inside one task.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from starchart_spark.operators import skew
from starchart_spark.operators.text import STOPWORDS


def _terms(text_col: str) -> F.Column:
    """lowercase → non-alphanumeric runs to one space → whitespace split.
    Mirrored verbatim in the DuckDB oracle; keep both in sync."""
    return F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")), " "
    )


def anchor_terms(
    links: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    text_col: str = "anchor",
    k: int = 10,
    stopwords: Sequence[str] = tuple(STOPWORDS),
) -> DataFrame:
    """(``dst_col``, term, n_hosts, rank) — the top ``k`` inbound anchor
    terms per target host, weighted by distinct linking hosts, ranked by
    (n_hosts DESC, term ASC) so the result is a pure function of the edge
    set. Empty/stopword tokens drop before the first exchange."""
    sw = [s.lower() for s in stopwords]
    terms = (
        links.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.explode(_terms(text_col)).alias("term"),
        )
        .filter((F.length("term") > 0) & ~F.col("term").isin(sw))
        .distinct()
    )
    weighted = terms.groupBy(F.col("dst").alias(dst_col), "term").agg(
        F.count(F.lit(1)).alias("n_hosts")
    )
    ranked = skew.ranked_by_host(
        weighted,
        dst_col,
        ["n_hosts", "term"],
        out_col="rank",
        ascending=[False, True],
    )
    return ranked.filter(F.col("rank") <= k).select(dst_col, "term", "n_hosts", "rank")


def anchor_terms_sql(
    links_cte: str,
    k: int = 10,
    stopwords: Sequence[str] = tuple(STOPWORDS),
) -> str:
    """DuckDB oracle: ``links_cte`` yields (src, dst, anchor). Replays the
    identical tokenize → host-distinct → count → rank program (plain
    row_number in the oracle role; the operator's two-pass ranker is
    plan-shape, not semantics)."""
    sw = ", ".join(f"'{s.lower()}'" for s in stopwords)
    return f"""
WITH links AS ({links_cte}),
terms AS (
  SELECT DISTINCT src, dst, term FROM (
    SELECT src, dst,
           unnest(string_split(trim(regexp_replace(lower(anchor),
                  '[^a-z0-9]+', ' ', 'g')), ' ')) AS term
    FROM links
  ) WHERE length(term) > 0 AND term NOT IN ({sw})
),
weighted AS (
  SELECT dst, term, CAST(COUNT(*) AS BIGINT) AS n_hosts
  FROM terms GROUP BY dst, term
),
ranked AS (
  SELECT dst, term, n_hosts,
         CAST(row_number() OVER (PARTITION BY dst
              ORDER BY n_hosts DESC, term ASC) AS BIGINT) AS rank
  FROM weighted
)
SELECT dst, term, n_hosts, rank FROM ranked WHERE rank <= {k}
"""
