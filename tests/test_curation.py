"""Semantics tests for the corpus-curation operators (operators/curation.py)
on hand-built documents with known-by-construction signals. The sf-scale
DuckDB-oracle parity for the same ops lives in test_entry_oracle.py
(repetition_ratios / contamination_hits / boilerplate_coverage /
curated_corpus registry entries).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from starchart_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_top_ngram_ratio_known_mode(spark):
    # "a b a b a" → bigrams: [a b, b a, a b, b a] → mode count 2 of 4
    # trigrams: [a b a, b a b, a b a] → mode 2 of 3
    df = _docs(spark, [(1, "a b a b a")])
    row = df.select(
        curation.top_ngram_ratio("text", 2).alias("r2"),
        curation.top_ngram_ratio("text", 3).alias("r3"),
    ).first()
    assert row.r2 == 0.5
    assert row.r3 == round(2 / 3, 6)


def test_top_ngram_ratio_degenerate_docs(spark):
    df = _docs(spark, [(1, ""), (2, "solo"), (3, "x x x x")])
    rows = {
        r.doc_id: r.r2
        for r in df.select(
            "doc_id", curation.top_ngram_ratio("text", 2).alias("r2")
        ).collect()
    }
    assert rows[1] == 0.0  # no tokens → no bigrams
    assert rows[2] == 0.0  # one token → no bigrams
    assert rows[3] == 1.0  # all bigrams identical


def test_repetition_ratios_is_shuffle_free(spark):
    df = _docs(spark, [(1, "a b c"), (2, "d e f g")])
    plan = curation.repetition_ratios(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_arrow_kernel_equals_jvm_fold(spark):
    # the production Arrow kernel and the cross-validation JVM fold must
    # agree exactly (incl. edge whitespace, repeats, short docs) — and on
    # the real corpus
    rows = [
        (1, "a b a b a b c"),
        (2, "  x\ty \n z  x y "),
        (3, "solo"),
        (4, ""),
        (5, "r r r r r r"),
        # JVM-quirk rows: Spark trim strips SPACES only, and split keeps
        # empty tokens at a tab/newline boundary — the naive .strip()
        # kernel diverged on every one of these (denominator off by one)
        (6, "\tq w q w"),
        (7, "a b a b\n"),
        (8, "\t"),
        (9, None),
    ]
    df = _docs(spark, rows)
    for n in (2, 3):
        got = {
            r.doc_id: r.r
            for r in df.select(
                "doc_id", F.round(curation.mode_ratio_udf(n)("text"), 6).alias("r")
            ).collect()
        }
        want = {
            r.doc_id: r.r
            for r in df.select(
                "doc_id", curation.top_ngram_ratio("text", n).alias("r")
            ).collect()
        }
        assert got == want
    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = corpus.select(
        F.sum(F.round(curation.mode_ratio_udf(2)("text"), 6))
    ).first()[0]
    b = corpus.select(F.sum(curation.top_ngram_ratio("text", 2))).first()[0]
    assert abs(a - b) < 1e-9


def test_contamination_hits_counts_shared_distinct_ngrams(spark):
    # bench doc 10 (10 % 10 == 0); doc 11 shares exactly the distinct
    # 2-gram "p q"; doc 12 shares nothing; doc 13 repeats the shared gram
    # twice but must still count it ONCE (distinct semantics).
    df = _docs(
        spark,
        [
            (10, "p q r"),
            (11, "z p q"),
            (12, "m n o"),
            (13, "p q w p q"),
        ],
    )
    out = {
        r.doc_id: r.n_shared
        for r in curation.contamination_hits(df, n=2).collect()
    }
    assert out == {11: 1, 13: 1}


def test_boilerplate_coverage_threshold(spark):
    # 4 docs; bigram "the end" appears in all 4 (df=4 >= ceil(0.5*4)=2);
    # every other bigram is unique to its doc.
    df = _docs(
        spark,
        [
            (1, "aa bb the end"),
            (2, "cc dd the end"),
            (3, "ee ff the end"),
            (4, "gg hh the end"),
        ],
    )
    out = curation.boilerplate_coverage(df, n=2, min_frac=0.5).collect()
    # per doc: distinct bigrams = {aa bb, bb the, the end} → boiler set must
    # contain exactly "the end" (df=4) → coverage 1/3
    assert {r.doc_id for r in out} == {1, 2, 3, 4}
    for r in out:
        assert r.coverage == round(1 / 3, 6)


def test_boilerplate_coverage_no_ngram_doc_is_zero(spark):
    df = _docs(spark, [(1, "only"), (2, "a b a b"), (3, "a b c")])
    out = {
        r.doc_id: r.coverage
        for r in curation.boilerplate_coverage(df, n=2, min_frac=0.5).collect()
    }
    assert out[1] == 0.0  # no bigrams at all, still present with 0.0


def test_curated_corpus_composed_filters(spark):
    long_clean = " ".join(f"w{i}" for i in range(40))  # unique bigrams
    repetitive = "x y " * 20  # top2_ratio ≈ 0.5
    short = "a b c"
    # contaminated: shares its 3-gram "c1 c2 c3" with bench doc 0
    bench = "c1 c2 c3 filler other words here padding " + " ".join(
        f"b{i}" for i in range(32)
    )
    contaminated = "c1 c2 c3 " + " ".join(f"u{i}" for i in range(37))
    df = _docs(
        spark,
        [
            (0, bench),          # benchmark slice (0 % 10 == 0)
            (1, long_clean),     # kept
            (2, repetitive),     # dropped: repetition
            (3, short),          # dropped: too short
            (4, contaminated),   # dropped: shares 3-gram with bench
        ],
    )
    out = curation.curated_corpus(
        df, min_tokens=30, max_top2_ratio=0.2, contamination_n=3
    ).collect()
    assert [r.doc_id for r in out] == [1]
    assert out[0].n_tokens == 40


def test_percentile_buckets_known_terciles(spark):
    # stratum A: 6 distinct scores → pr = i/5: 0,.2 tail | .4,.6 middle
    # (both < 2/3) | .8,1.0 head; stratum B: single row → pr 0 → tail;
    # stratum C: tied minima share rank 1 → pr 0 → both tail
    rows = [("A", i, float(i)) for i in range(1, 7)]
    rows += [("B", 10, 9.0), ("C", 20, 5.0), ("C", 21, 5.0), ("C", 22, 7.0)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, score double")
    out = {
        r.doc_id: r.bucket
        for r in curation.percentile_buckets(
            df, score_col="score", by_col="lang"
        ).collect()
    }
    assert [out[i] for i in range(1, 7)] == [
        "tail", "tail", "middle", "middle", "head", "head"
    ]
    assert out[10] == "tail"
    assert out[20] == out[21] == "tail" and out[22] == "head"


def test_percentile_buckets_at_scale_agrees_and_avoids_sort(spark):
    from pyspark.sql import functions as F

    # 3 strata x 120 distinct scores — the approx path (accuracy >> n) must
    # agree with the exact path on bucket sizes within the boundary-tie
    # convention (± the docs exactly at a threshold)
    df = (
        spark.range(360)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("L"), (F.col("id") % 3).cast("string")).alias("lang"),
            (F.col("id") * 7919 % 3571).cast("double").alias("score"),
        )
    )
    exact = (
        curation.percentile_buckets(df, "score", "lang")
        .groupBy("lang", "bucket").count().collect()
    )
    at_scale = (
        curation.percentile_buckets_at_scale(df, "score", "lang", accuracy=100000)
        .groupBy("lang", "bucket").count().collect()
    )
    e = {(r.lang, r.bucket): r["count"] for r in exact}
    a = {(r.lang, r.bucket): r["count"] for r in at_scale}
    assert set(e) == set(a)
    for k in e:
        assert abs(e[k] - a[k]) <= 2, (k, e[k], a[k])
    # the at-scale plan must not sort-window per stratum (the skew hazard
    # the function exists to avoid) and must broadcast the threshold dim
    plan = (
        curation.percentile_buckets_at_scale(df, "score", "lang")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "Broadcast" in plan
