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


# -- suffix array (prefix doubling) ------------------------------------------


def _brute_suffix_ranks(rows):
    """Python oracle: dense rank of suffix token-tuples (tuple comparison
    IS token-wise lexicographic, shorter-prefix-first)."""
    sufs = {}
    for doc_id, text in rows:
        toks = text.split()
        for pos in range(len(toks)):
            sufs[(doc_id, pos)] = tuple(toks[pos:])
    order = sorted(set(sufs.values()))
    rank = {s: i + 1 for i, s in enumerate(order)}
    return {k: rank[v] for k, v in sufs.items()}


def _sa(spark, rows, **kw):
    out = substrings.suffix_ranks(_docs(spark, rows), **kw)
    return {(r["doc_id"], r["pos"]): r["srank"] for r in out.collect()}


def test_suffix_ranks_match_brute_force(spark):
    import random

    rng = random.Random(7)
    vocab = ["a", "b", "ab", "ba", "aa", "c"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 17))))
        for i in range(12)
    ]
    assert _sa(spark, rows) == _brute_suffix_ranks(rows)


def test_identical_docs_share_every_rank(spark):
    rows = [(1, "x y x z"), (2, "x y x z"), (3, "y x z q")]
    got = _sa(spark, rows)
    exp = _brute_suffix_ranks(rows)
    assert got == exp
    # cross-doc equal suffixes share a DENSE rank
    for pos in range(4):
        assert got[(1, pos)] == got[(2, pos)]
    # and "x z" (doc1 pos2) == "x z" nowhere in doc3 ("x z q" differs)
    assert got[(1, 2)] != got[(3, 1)]


def test_prefix_sorts_before_extension(spark):
    # suffix "a" < "a a" < "a a a": shorter prefix first (end sentinel)
    rows = [(1, "a a a")]
    got = _sa(spark, rows)
    assert got == {(1, 2): 1, (1, 1): 2, (1, 0): 3}


def test_max_tokens_truncates_consistently(spark):
    rows = [(1, "p q r s t u v w"), (2, "p q r different tail here x y")]
    got = _sa(spark, rows, max_tokens=3)
    exp = _brute_suffix_ranks([(1, "p q r"), (2, "p q r")])
    assert got == exp


# -- longest repeated prefix / repeated spans ---------------------------------


def _brute_lrp(rows):
    """Python oracle: per suffix, longest prefix occurring at >= 2 distinct
    corpus positions = max LCP against every OTHER suffix (identical
    suffixes give LCP = full length)."""
    sufs = []
    for doc_id, text in rows:
        toks = text.split()
        for pos in range(len(toks)):
            sufs.append((doc_id, pos, tuple(toks[pos:])))

    def lcp(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    out = {}
    for i, (d, p, s) in enumerate(sufs):
        out[(d, p)] = max(
            (lcp(s, s2) for j, (_, _, s2) in enumerate(sufs) if j != i), default=0
        )
    return out


def _brute_cover(rows, length):
    """Python oracle for repeated_spans: duplicated-L-gram coverage."""
    from collections import Counter

    grams = Counter()
    per_doc = {}
    for doc_id, text in rows:
        toks = text.split()
        per_doc[doc_id] = toks
        for i in range(len(toks) - length + 1):
            grams[tuple(toks[i : i + length])] += 1
    covered = set()
    for doc_id, toks in per_doc.items():
        for i in range(len(toks) - length + 1):
            if grams[tuple(toks[i : i + length])] >= 2:
                covered.update((doc_id, i + j) for j in range(length))
    return covered


def _lrp(spark, rows, **kw):
    out = substrings.longest_repeated_prefix(_docs(spark, rows), **kw)
    return {(r["doc_id"], r["pos"]): r["lrp"] for r in out.collect()}


def test_lrp_matches_brute_force_random(spark):
    import random

    rng = random.Random(11)
    vocab = ["a", "b", "c", "ab"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 19))))
        for i in range(10)
    ]
    assert _lrp(spark, rows) == _brute_lrp(rows)


def test_lrp_identical_docs_full_length(spark):
    rows = [(1, "q w e r t y"), (2, "q w e r t y"), (3, "zz")]
    got = _lrp(spark, rows)
    # every suffix of docs 1/2 is duplicated wholesale
    for pos in range(6):
        assert got[(1, pos)] == 6 - pos
        assert got[(2, pos)] == 6 - pos
    assert got[(3, 0)] == 0


def test_lrp_cross_doc_partial_overlap(spark):
    # "x y z" shared; doc tails diverge
    rows = [(1, "x y z alpha"), (2, "x y z beta gamma")]
    got = _lrp(spark, rows)
    assert got[(1, 0)] == 3 and got[(2, 0)] == 3
    assert got[(1, 1)] == 2 and got[(2, 1)] == 2
    assert got[(1, 3)] == 0 and got[(2, 3)] == 0


def test_lrp_within_doc_repeat(spark):
    rows = [(1, "m n m n o")]
    got = _lrp(spark, rows)
    assert got == _brute_lrp(rows)
    assert got[(1, 0)] == 2  # "m n" recurs at pos 2


def test_repeated_spans_equals_gram_coverage(spark):
    import random

    rng = random.Random(23)
    vocab = ["u", "v", "w"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 25))))
        for i in range(8)
    ]
    for L in (3, 5):
        got = {
            (r["doc_id"], r["pos"])
            for r in substrings.repeated_spans(
                _docs(spark, rows), length=L
            ).collect()
        }
        assert got == _brute_cover(rows, L)


def test_repeated_spans_matches_removal_complement(spark):
    # suffix-array coverage == exactly the tokens remove_duplicated_substrings
    # cuts (two independent formulations of Lee et al.)
    rows = [(1, "a w x y z b"), (2, "w x y z c d"), (3, "solo words only")]
    cov = {
        (r["doc_id"], r["pos"])
        for r in substrings.repeated_spans(_docs(spark, rows), length=4).collect()
    }
    cleaned = _run(spark, rows, length=4)
    for doc_id, text in rows:
        toks = text.split()
        kept = [t for i, t in enumerate(toks) if (doc_id, i) not in cov]
        assert " ".join(kept) == cleaned[doc_id]
