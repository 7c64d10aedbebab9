"""Inbound anchor-term aggregation: spam resistance, top-k, oracle parity."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from starchart_spark.operators import anchors


def test_distinct_host_weighting_resists_spam(spark):
    # spam.net links to target.org 5 times screaming "pills"; three honest
    # hosts each say "compiler" once — compiler must outrank pills 3:1
    rows = [("spam.net", "target.org", "pills PILLS pills!!")] * 5 + [
        ("a.org", "target.org", "great compiler"),
        ("b.org", "target.org", "rust compiler docs"),
        ("c.org", "target.org", "compiler"),
    ]
    links = spark.createDataFrame(rows, ["src", "dst", "anchor"])
    out = {
        (r["term"]): (r["n_hosts"], r["rank"])
        for r in anchors.anchor_terms(links, k=10).collect()
    }
    assert out["compiler"] == (3, 1)
    assert out["pills"][0] == 1  # five shouts, one host, weight 1


def test_topk_cut_and_tie_order(spark):
    # four terms with weights 2,2,1,1 — rank is (n_hosts DESC, term ASC)
    rows = [
        ("h1", "t", "alpha beta"),
        ("h2", "t", "alpha beta gamma"),
        ("h3", "t", "delta"),
    ]
    links = spark.createDataFrame(rows, ["src", "dst", "anchor"])
    got = [
        (r["term"], r["n_hosts"], r["rank"])
        for r in anchors.anchor_terms(links, k=3)
        .orderBy("rank")
        .collect()
    ]
    assert got == [("alpha", 2, 1), ("beta", 2, 2), ("delta", 1, 3)]


def test_stopwords_and_empties_drop(spark):
    links = spark.createDataFrame(
        [("s", "t", "the of and ... to is"), ("s2", "t", "  ")],
        ["src", "dst", "anchor"],
    )
    assert anchors.anchor_terms(links).count() == 0


def test_sql_oracle_parity(spark):
    # deterministic many-host corpus with shared + unique vocab and ties
    links = spark.range(300).select(
        F.concat(F.lit("s"), (F.col("id") % 29).cast("string")).alias("src"),
        F.concat(F.lit("d"), (F.col("id") % 7).cast("string")).alias("dst"),
        F.concat(
            F.lit("Word"), ((F.col("id") * 3) % 11).cast("string"),
            F.lit(", the common-term & w"), (F.col("id") % 5).cast("string"),
        ).alias("anchor"),
    )
    got = sorted(
        tuple(r) for r in anchors.anchor_terms(links, k=4).collect()
    )
    sql = anchors.anchor_terms_sql(
        """SELECT 's' || (id % 29) AS src, 'd' || (id % 7) AS dst,
                  'Word' || ((id * 3) % 11) || ', the common-term & w' || (id % 5) AS anchor
           FROM (SELECT unnest(range(0, 300)) AS id)""",
        k=4,
    )
    want = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert got == want
