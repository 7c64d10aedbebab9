"""Text-analysis + document-dedup operators over the driver-provided
documents table (sf0.001)."""

import os

import pytest
from pyspark.sql import functions as F

from starchart_spark.operators import dedup_text, text

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


def test_token_count_matches_n_chars_shape(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("single",)], ["text"]
    ).withColumn("n", text.token_count("text"))
    got = [r["n"] for r in df.collect()]
    assert got == [3, 0, 0, 1]


def test_quality_features(docs):
    out = text.quality_features(docs)
    row = out.filter(F.col("doc_id") == 0).collect()[0]
    assert row["n_chars_calc"] == row["n_chars"]  # matches the table's own count
    assert 0.0 <= row["punct_ratio"] <= 1.0
    assert 0.0 <= row["quality_score"] <= 1.0
    assert out.filter(F.col("n_tokens") <= 0).count() == 0


def test_lang_id_deterministic(docs):
    out = text.lang_id(docs)
    assert out.filter(F.col("lang_pred").isNull()).count() == 0
    again = {r["doc_id"]: r["lang_pred"] for r in text.lang_id(docs).collect()}
    first = {r["doc_id"]: r["lang_pred"] for r in out.collect()}
    assert first == again


def test_normalize_text(spark):
    rows = [
        (1, "  Hello\t\tWORLD \n"),
        (2, "a\x00b\x01c"),          # non-ws controls vanish, no space
        (3, "x​Y﻿z"),      # zero-width marks vanish
        (4, "line1\nline2"),         # ws controls become ONE space
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", text.normalize_text("text").alias("n")).collect()
    }
    assert got == {1: "hello world", 2: "abc", 3: "xyz", 4: "line1 line2"}


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame([("a bb ccc",), ("ccc bb a",)], ["text"])
    out = [r["fp"] for r in text.fingerprint(df).collect()]
    assert out[0] != out[1]  # rolling hash is order-sensitive
    assert all(0 <= f < text.FP_MOD for f in out)


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], ["doc_id", "text"]
    )
    out = sorted(r["doc_id"] for r in dedup_text.exact_dedup(df).collect())
    assert out == [1, 3]  # min id survives


def test_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    got = {r["shingle"] for r in dedup_text.shingles(df).collect()}
    assert got == {"a b c", "b c d"}
    short = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    assert dedup_text.shingles(short).count() == 0


def test_ngram_jaccard_and_lsh_agree(spark, docs):
    """LSH with verify must equal exact jaccard pairs at this threshold
    (recall at j≈0.99 with 16 bands × 4 rows is 1 - (1-0.96)^16 ≈ 1-1e-22)."""
    exact = {
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in dedup_text.ngram_jaccard_pairs(docs, 0.8).collect()
    }
    lsh = {
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in dedup_text.minhash_lsh_pairs(spark, docs, 0.8).collect()
    }
    assert exact, "corpus should contain planted near-dupes"
    assert lsh == exact


def test_ngram_jaccard_prefix_equals_naive(spark, docs):
    """Prefix filtering is an exact optimization: identical pair set to the
    naive inverted-index join at the same threshold — including on corpora
    with a planted hot shingle shared by every doc (the case that explodes
    the naive join's buckets but sorts LAST in df order, outside prefixes)."""
    for thresh in (0.8, 0.5):
        exact = {
            (r["a_id"], r["b_id"], r["jaccard"])
            for r in dedup_text.ngram_jaccard_pairs(docs, thresh).collect()
        }
        pre = {
            (r["a_id"], r["b_id"], r["jaccard"])
            for r in dedup_text.ngram_jaccard_pairs_prefix(docs, thresh).collect()
        }
        assert exact and pre == exact
    hot = docs.withColumn("text", F.concat(F.col("text"), F.lit(" common tail phrase")))
    a = {
        tuple(r) for r in dedup_text.ngram_jaccard_pairs(hot, 0.8).collect()
    }
    b = {
        tuple(r) for r in dedup_text.ngram_jaccard_pairs_prefix(hot, 0.8).collect()
    }
    assert a == b


def test_simhash_near_dupes(spark, docs):
    pairs = dedup_text.simhash_near_dupes(spark, docs, max_hamming=3)
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    # simhash(hamming≤3) should overlap heavily with jaccard≥0.8 planted dupes
    exact = {
        (r["a_id"], r["b_id"])
        for r in dedup_text.ngram_jaccard_pairs(docs, 0.9).collect()
    }
    assert exact
    assert len(got & exact) / len(exact) > 0.6
