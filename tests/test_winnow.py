"""Winnowing fingerprints: the paper's window-coverage guarantee, the
rightmost-min tie rule, short-document degeneration, production-vs-portable
mode equivalence of the selection logic, and the match step."""

import pytest
from pyspark.sql import functions as F

from starchart_spark.operators import winnow


def _fps(spark, texts, k=4, w=5, portable=False):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    return winnow.winnow_fingerprints(df, k=k, w=w, portable=portable)


def _grams_with_hashes(spark, text, k, portable):
    # recompute every gram hash by running winnowing with w=1 (every
    # window is one gram → every gram is selected): the full gram table
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    rows = winnow.winnow_fingerprints(df, k=k, w=1, portable=portable).collect()
    return {r["pos"]: r["gh"] for r in rows}


@pytest.mark.parametrize("portable", [False, True])
def test_window_coverage_guarantee(spark, portable):
    """THE winnowing property: every window of w consecutive grams
    contains at least one selected fingerprint position."""
    k, w = 3, 4
    text = " ".join(f"t{i % 7}" for i in range(60))  # repetitive → many ties
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    sel = {
        r["pos"]
        for r in winnow.winnow_fingerprints(
            df, k=k, w=w, portable=portable
        ).collect()
    }
    m = 60 - k + 1
    for start in range(1, m - w + 2):
        window = set(range(start, start + w))
        assert window & sel, f"window at {start} has no fingerprint"


@pytest.mark.parametrize("portable", [False, True])
def test_rightmost_min_selection(spark, portable):
    """Selected positions are exactly the rightmost-argmin of each window
    over the true gram hashes (independently recomputed via w=1)."""
    k, w = 3, 4
    text = " ".join(f"w{(i * 13) % 11}" for i in range(30))
    hashes = _grams_with_hashes(spark, text, k, portable)
    m = len(hashes)
    expect = set()
    for start in range(1, max(m - w + 1, 1) + 1):
        window = list(range(start, min(start + w, m + 1)))
        best = min(window, key=lambda p: (hashes[p], -p))
        expect.add((best, hashes[best]))
    got = {
        (r["pos"], r["gh"])
        for r in _fps(spark, [text], k=k, w=w, portable=portable).collect()
    }
    assert got == expect


def test_short_document_single_window(spark):
    # fewer grams than w: one clipped window, exactly one fingerprint
    text = "alpha beta gamma delta epsilon"  # 5 tokens, k=4 → 2 grams < w
    out = _fps(spark, [text], k=4, w=5).collect()
    assert len(out) == 1
    # and a doc shorter than k tokens yields no grams at all
    assert _fps(spark, ["just three tokens"], k=4, w=5).count() == 0


def test_partition_invariance(spark):
    texts = [" ".join(f"x{(i * j) % 19}" for j in range(40)) for i in range(20)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    a = set(map(tuple, winnow.winnow_fingerprints(df, 4, 5).collect()))
    b = set(map(tuple, winnow.winnow_fingerprints(df.repartition(7), 4, 5).collect()))
    assert a == b


def test_shared_substring_detected(spark):
    """Documents sharing a run of ≥ w+k-1 tokens share a fingerprint —
    the guarantee the match step builds on."""
    k, w = 4, 5
    shared = " ".join(f"s{i}" for i in range(k + w - 1))  # exactly w+k-1 tokens
    texts = [
        "aa bb cc " + shared + " dd ee",
        "zz yy " + shared + " xx ww vv",
        "totally different words here with no overlap at all everywhere",
    ]
    fps = _fps(spark, texts, k=k, w=w)
    pairs = {
        (r["a_id"], r["b_id"])
        for r in winnow.fingerprint_matches(fps).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_mirror_hosts_detection(spark):
    """Full mirrors hit containment 1.0; a partial mirror scores by the
    smaller fingerprint set; unrelated hosts stay out."""
    base = " ".join(f"tok{(i * 7) % 23}" for i in range(60))
    other = " ".join(f"zzz{(i * 11) % 29}" for i in range(60))
    rows = [
        (0, "orig", base),
        (1, "mirror", base),                     # exact copy
        (2, "partial", base + " extra tail " + other[:40]),
        (3, "unrelated", other),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "hostname", "text"])
    fps = winnow.winnow_fingerprints(df, k=4, w=5).join(
        df.select("doc_id", "hostname"), "doc_id"
    )
    pairs = {
        (r["a_host"], r["b_host"]): r["containment"]
        for r in winnow.mirror_hosts(fps, min_shared=1, min_ratio=0.0).collect()
    }
    assert pairs[("mirror", "orig")] == 1.0
    assert pairs[("orig", "partial")] >= 0.8  # shares the full base text
    assert ("orig", "unrelated") not in pairs or pairs[("orig", "unrelated")] < 0.3
    # the production threshold keeps only real mirrors
    strict = {
        (r["a_host"], r["b_host"])
        for r in winnow.mirror_hosts(fps, min_shared=2, min_ratio=0.95).collect()
    }
    assert ("mirror", "orig") in strict and ("orig", "unrelated") not in strict
