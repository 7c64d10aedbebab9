"""Duplicated-substring removal semantics (operators/substrings.py)."""

from __future__ import annotations

from starchart_spark.operators import substrings


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, rows, length=3, min_count=2):
    out = substrings.remove_duplicated_substrings(
        _docs(spark, rows), length=length, min_count=min_count
    )
    return {r.doc_id: r.clean_text for r in out.collect()}


def test_cross_doc_span_removed_at_any_offset(spark):
    # the 4-token span "w x y z" sits at offset 1 in doc 1 and offset 0 in
    # doc 2 — position-free removal cuts BOTH (paragraph dedup on fixed
    # boundaries would miss this)
    rows = [(1, "a w x y z b"), (2, "w x y z c d")]
    got = _run(spark, rows, length=4)
    assert got == {1: "a b", 2: "c d"}


def test_overlapping_windows_merge_coverage(spark):
    # "p q r s t" duplicated: windows (p q r),(q r s),(r s t) all frequent,
    # coverage merges to the full 5-token run — no partial leftovers
    rows = [(1, "p q r s t one"), (2, "p q r s t two")]
    got = _run(spark, rows, length=3)
    assert got == {1: "one", 2: "two"}


def test_within_doc_repeat_counts_as_duplicate(spark):
    # occurrence count, not document frequency: a doc repeating its own
    # 3-gram twice crosses min_count=2 alone
    rows = [(1, "m n o m n o tail"), (2, "other text here")]
    got = _run(spark, rows, length=3)
    assert got[1] == "tail"
    assert got[2] == "other text here"


def test_short_docs_and_uncovered_text_untouched(spark):
    rows = [(1, "a b"), (2, "unique words only here")]
    got = _run(spark, rows, length=3)
    assert got == {1: "a b", 2: "unique words only here"}


def test_fully_duplicated_doc_becomes_empty_row(spark):
    rows = [(1, "c1 c2 c3 c4"), (2, "c1 c2 c3 c4")]
    got = _run(spark, rows, length=4)
    assert got == {1: "", 2: ""}


def test_min_count_floor(spark):
    rows = [(1, "f g h x"), (2, "f g h y"), (3, "f g h z")]
    # "f g h" occurs 3x: survives min_count=4, cut at min_count=3
    assert _run(spark, rows, length=3, min_count=4) == {
        1: "f g h x", 2: "f g h y", 3: "f g h z"
    }
    assert _run(spark, rows, length=3, min_count=3) == {1: "x", 2: "y", 3: "z"}


def test_partition_invariance(spark):
    rows = [(i, f"shared run of words {i}") for i in range(12)]
    df = _docs(spark, rows)
    a = sorted(
        map(tuple, substrings.remove_duplicated_substrings(df, length=4).collect())
    )
    b = sorted(
        map(
            tuple,
            substrings.remove_duplicated_substrings(
                df.repartition(7), length=4
            ).collect(),
        )
    )
    assert a == b
    assert all(t == str(i) for i, t in a)
