"""Paragraph-level dedup semantics (operators/paragraphs.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from starchart_spark.operators import paragraphs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_remove_frequent_preserves_order_and_blanks(spark):
    # "SHARED" appears in docs 1,2,3 (df=3 ≥ 2) → cut everywhere; doc-local
    # paragraphs survive in their original order; blank paragraphs (double
    # separator) never count and never reappear in the canonical output
    rows = [
        (1, "alpha one\nSHARED\nalpha two"),
        (2, "SHARED\n\nbeta only"),
        (3, "gamma a\ngamma b\nSHARED"),
        (4, "delta solo"),
    ]
    out = {
        r.doc_id: r.clean_text
        for r in paragraphs.paragraph_dedup(_docs(spark, rows)).collect()
    }
    assert out == {
        1: "alpha one\nalpha two",
        2: "beta only",
        3: "gamma a\ngamma b",
        4: "delta solo",
    }


def test_fully_boilerplate_doc_comes_back_empty(spark):
    rows = [(1, "X\nY"), (2, "X\nY"), (3, "X\nkeep me")]
    out = {
        r.doc_id: r.clean_text
        for r in paragraphs.paragraph_dedup(_docs(spark, rows)).collect()
    }
    # docs 1/2 are 100% boilerplate → present with '' (row parity holds)
    assert out == {1: "", 2: "", 3: "keep me"}


def test_min_df_floor(spark):
    rows = [(1, "P\na1"), (2, "P\nb1"), (3, "P\nc1")]
    # df("P") = 3: survives min_df=4, cut at min_df=3
    keep_all = paragraphs.paragraph_dedup(_docs(spark, rows), min_df=4)
    assert all("P" in r.clean_text for r in keep_all.collect())
    cut = paragraphs.paragraph_dedup(_docs(spark, rows), min_df=3)
    assert all("P" not in r.clean_text for r in cut.collect())


def test_df_counts_docs_not_occurrences(spark):
    # "R" occurs 3x inside doc 1 but in only one DOCUMENT → df=1 < 2 → kept
    rows = [(1, "R\nR\nR"), (2, "other")]
    out = {
        r.doc_id: r.clean_text
        for r in paragraphs.paragraph_dedup(_docs(spark, rows)).collect()
    }
    assert out[1] == "R\nR\nR"


def test_chunk_paragraphs_windows_and_tail(spark):
    df = _docs(spark, [(1, "a b c d e f g h"), (2, ""), (3, "x")])
    got = sorted(
        (r.doc_id, r.pidx, r.para)
        for r in paragraphs.chunk_paragraphs(df, chunk_tokens=3).collect()
    )
    # doc 1: 8 tokens → windows of 3,3,2; doc 2 blank → nothing; doc 3: 1
    assert got == [
        (1, 0, "a b c"),
        (1, 1, "d e f"),
        (1, 2, "g h"),
        (3, 0, "x"),
    ]


def test_frequent_set_is_broadcast_and_partition_invariant(spark):
    rows = [(i, f"COMMON\nuniq {i}") for i in range(1, 9)]
    df = _docs(spark, rows)
    plan = (
        paragraphs.paragraph_dedup(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the frequent-set removal must be a BROADCAST anti-join (the corpus
    # never shuffles for the decision)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    a = sorted(map(tuple, paragraphs.paragraph_dedup(df).collect()))
    b = sorted(
        map(tuple, paragraphs.paragraph_dedup(df.repartition(7)).collect())
    )
    assert a == b
    assert all(t == f"uniq {i}" for i, t in a)


def test_host_template_strip_is_host_local(spark):
    """A host's 100%-share nav strips from ITS pages only; the same text
    on a single page of another host survives (host-local anti-join)."""
    from starchart_spark.operators import paragraphs as P

    rows = [
        # host a: NAV on both pages (template), unique bodies
        ("a", 1, 0, "NAV"), ("a", 1, 1, "body one"),
        ("a", 2, 0, "NAV"), ("a", 2, 1, "body two"),
        # host b: NAV on 1 of 3 pages (33% < 50% share) -> content there
        ("b", 3, 0, "NAV"), ("b", 3, 1, "essay"),
        ("b", 4, 0, "other"), ("b", 5, 0, "more"),
    ]
    paras = spark.createDataFrame(
        rows, "hostname string, doc_id long, pidx int, para string"
    )
    tmpl = {
        (r["hostname"], r["para"])
        for r in P.host_template_paragraphs(paras).collect()
    }
    assert tmpl == {("a", "NAV")}
    got = {
        (r["hostname"], r["doc_id"]): r["clean_text"]
        for r in P.strip_host_template(paras).collect()
    }
    assert got[("a", 1)] == "body one"
    assert got[("a", 2)] == "body two"
    assert got[("b", 3)] == "NAV\nessay"  # survives on host b
    assert got[("b", 4)] == "other"


def test_host_template_all_template_page_comes_back_empty(spark):
    from starchart_spark.operators import paragraphs as P

    rows = [
        ("a", 1, 0, "NAV"), ("a", 1, 1, "body"),
        ("a", 2, 0, "NAV"),  # page 2 is pure template
    ]
    paras = spark.createDataFrame(
        rows, "hostname string, doc_id long, pidx int, para string"
    )
    got = {
        (r["hostname"], r["doc_id"]): r["clean_text"]
        for r in P.strip_host_template(paras).collect()
    }
    assert got[("a", 2)] == ""
    assert got[("a", 1)] == "body"


def test_host_template_min_pages_floor(spark):
    """A single-page host never templates (min_pages=2 floor), even at
    100% share."""
    from starchart_spark.operators import paragraphs as P

    paras = spark.createDataFrame(
        [("solo", 1, 0, "only page text")],
        "hostname string, doc_id long, pidx int, para string",
    )
    assert P.host_template_paragraphs(paras).count() == 0
