"""Interleaved media↔text context pairing (operators/interleave.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from starchart_spark.operators import interleave

SPAN_SCHEMA = (
    "doc_id long, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _span(kind, text=None, ref=None, off=0):
    return Row(kind=kind, text=text, media_ref=ref, offset=off)


def _pairs(spark, rows):
    df = spark.createDataFrame(rows, SPAN_SCHEMA)
    return {
        (r["doc_id"], r["media_ref"]): r.asDict()
        for r in interleave.media_text_pairs(df).collect()
    }


def test_nearest_text_wins_over_earlier_text(spark):
    got = _pairs(
        spark,
        [
            (
                1,
                [
                    _span("text", text="far", off=0),
                    _span("text", text="near", off=1),
                    _span("media", ref="m1", off=2),
                    _span("text", text="after1", off=3),
                    _span("text", text="after2", off=4),
                ],
            )
        ],
    )
    r = got[(1, "m1")]
    assert r["before_text"] == "near"
    assert r["after_text"] == "after1"
    assert r["n_text_before"] == 2
    assert r["n_media_in_doc"] == 1


def test_boundary_media_gets_nulls(spark):
    got = _pairs(
        spark,
        [
            (
                2,
                [
                    _span("media", ref="lead", off=0),
                    _span("text", text="mid", off=1),
                    _span("media", ref="trail", off=2),
                ],
            )
        ],
    )
    lead, trail = got[(2, "lead")], got[(2, "trail")]
    assert lead["before_text"] is None and lead["after_text"] == "mid"
    assert trail["before_text"] == "mid" and trail["after_text"] is None
    assert lead["n_media_in_doc"] == trail["n_media_in_doc"] == 2


def test_orders_by_offset_not_array_position(spark):
    # Same doc as test_nearest_text_wins but the ARRAY is shuffled; the
    # offset column, not array order, must drive the context windows.
    got = _pairs(
        spark,
        [
            (
                3,
                [
                    _span("text", text="after1", off=3),
                    _span("media", ref="m1", off=2),
                    _span("text", text="far", off=0),
                    _span("text", text="after2", off=4),
                    _span("text", text="near", off=1),
                ],
            )
        ],
    )
    r = got[(3, "m1")]
    assert r["before_text"] == "near"
    assert r["after_text"] == "after1"
    assert r["n_text_before"] == 2


def test_media_only_doc_all_null_context(spark):
    got = _pairs(
        spark,
        [(4, [_span("media", ref="a", off=0), _span("media", ref="b", off=1)])],
    )
    assert got[(4, "a")]["before_text"] is None
    assert got[(4, "a")]["after_text"] is None
    assert got[(4, "a")]["n_text_before"] == 0
    assert got[(4, "b")]["n_media_in_doc"] == 2


def test_single_exchange_plan(spark):
    """The whole operator is scan → explode → ONE window exchange →
    filter: exactly one Exchange in the physical plan."""
    df = spark.createDataFrame(
        [(1, [_span("text", text="t", off=0), _span("media", ref="m", off=1)])],
        SPAN_SCHEMA,
    )
    plan = (
        interleave.media_text_pairs(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_pairs_over_real_crawl_corpus(spark):
    """Over the ACTUAL interleaved corpus shape (crawl/corpus.py: api_json
    page span, then per-repo <h1> html + avatar media): every avatar's
    before_text is its own repo's <h1>, and media counts match the page."""
    from starchart_spark.crawl.corpus import CorpusSpec, make_corpus
    from starchart_spark.testing import corpus_to_spark

    corpus = make_corpus(CorpusSpec(n_forges=1, repos_per_forge=6, page_size=3))
    docs = corpus_to_spark(spark, corpus)["documents"]
    pairs = interleave.media_text_pairs(docs).collect()
    assert pairs  # avatars exist
    for r in pairs:
        assert r["media_ref"].endswith(".png")
        # the avatar follows its repo's <h1> html span immediately
        assert r["before_text"].startswith("<h1>") and r["before_text"].endswith("</h1>")
        # n_text_before counts the api_json span plus one h1 per repo slot
        # up to and including this avatar's own
        assert r["n_text_before"] >= 2
    by_doc = {}
    for r in pairs:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        assert all(r["n_media_in_doc"] == len(rows) for r in rows)


def test_multimodal_token_costs(spark):
    docs = spark.createDataFrame(
        [
            (1, [_span("text", text="a b c", off=0), _span("media", ref="m", off=1),
                 _span("text", text="d e", off=2), _span("media", ref="n", off=3)]),
            (2, [_span("media", ref="x", off=0)]),
            (3, [_span("text", text="  ", off=0)]),  # blank text counts 0
        ],
        SPAN_SCHEMA,
    )
    got = {
        r["doc_id"]: (r["n_text_tokens"], r["n_media"], r["mm_tokens"])
        for r in interleave.multimodal_token_costs(docs, media_token_cost=64).collect()
    }
    assert got[1] == (5, 2, 5 + 128)
    assert got[2] == (0, 1, 64)
    assert got[3] == (0, 0, 0)
