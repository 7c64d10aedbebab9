"""Span-sequence invariant (BASELINE.json input_hint): per document, the
sequence (kind, text, media_ref) ordered by offset must survive every
engine transformation — explode/reassemble must re-sort by offset."""

import pytest
from pyspark.sql import functions as F

from starchart_spark.crawl.corpus import CorpusSpec, make_corpus
from starchart_spark.operators.normalize import first_text_span
from starchart_spark.testing import corpus_to_spark


@pytest.fixture(scope="module")
def docs(spark):
    return corpus_to_spark(
        spark, make_corpus(CorpusSpec(n_forges=2, repos_per_forge=15))
    )["documents"]


def _canonical_span_seq(df):
    """doc_id → tuple of (kind, text, media_ref) in offset order."""
    seq = F.transform(
        F.expr("array_sort(spans, (a, b) -> a.offset - b.offset)"),
        lambda s: F.concat_ws(
            "", s["kind"], F.coalesce(s["text"], F.lit("<null>")),
            F.coalesce(s["media_ref"], F.lit("<null>")),
        ),
    )
    return {
        r["doc_id"]: tuple(r["seq"])
        for r in df.select("doc_id", seq.alias("seq")).collect()
    }


def test_roundtrip_through_shuffle(spark, docs):
    """Repartition + exchange must not perturb the in-array span order."""
    before = _canonical_span_seq(docs)
    after = _canonical_span_seq(docs.repartition(13, "doc_id"))
    assert before == after


def test_explode_reassemble_resorts(spark, docs):
    """posexplode → shuffle → collect_list + re-sort by offset reproduces the
    exact span sequence (the mandated pattern for any span rewrite)."""
    exploded = docs.select("doc_id", F.explode("spans").alias("s")).repartition(7)
    reassembled = (
        exploded.groupBy("doc_id")
        .agg(F.collect_list("s").alias("spans"))
        .withColumn("spans", F.expr("array_sort(spans, (a, b) -> a.offset - b.offset)"))
    )
    assert _canonical_span_seq(docs) == _canonical_span_seq(reassembled)


def test_first_text_span_is_offset_minimal(spark):
    rows = [
        (
            "d1",
            [
                ("api_json", "second", None, 5),
                ("media", None, "m.png", 3),
                ("api_json", "first", None, 1),
            ],
            "h",
        )
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, hostname string",
    )
    out = first_text_span(df).collect()[0]
    assert out["wire_json"] == "first"  # offset order, not array order


def test_interleaving_shape(docs):
    """Corpus pages interleave text and media spans: offsets strictly
    increasing, media refs alternate with html spans."""
    rows = docs.filter(F.col("doc_id").contains("page=1")).collect()
    for r in rows:
        offs = [s["offset"] for s in r["spans"]]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
        kinds = [s["kind"] for s in r["spans"]]
        assert kinds[0] == "api_json"
        if len(kinds) > 1:
            assert "media" in kinds and "html" in kinds
