"""Multimodal plumbing: media extraction from interleaved spans, binary
payload columns, Arrow-batched decode/feature stubs."""

import pytest
from pyspark.sql import functions as F

from starchart_spark.crawl.corpus import CorpusSpec, make_corpus
from starchart_spark.operators import multimodal
from starchart_spark.testing import corpus_to_spark


@pytest.fixture(scope="module")
def docs(spark):
    return corpus_to_spark(spark, make_corpus(CorpusSpec(n_forges=2, repos_per_forge=10)))[
        "documents"
    ]


def test_media_refs_extracted(spark, docs):
    media = multimodal.media_refs_from_documents(docs)
    rows = media.collect()
    assert len(rows) == 2  # one avatar per forge (owner 'bot')
    assert all(r["media_type"] == "image" for r in rows)
    assert all(r["media_ref"].endswith("/avatars/bot.png") for r in rows)


def test_media_type_dispatch(spark):
    df = spark.createDataFrame(
        [
            (1, [("media", None, "x/a.png", 0)]),
            (2, [("media", None, "x/b.mp4", 0)]),
            (3, [("media", None, "x/c.ogg", 0)]),
            (4, [("media", None, "x/d", 0)]),
        ],
        "doc_id int, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    got = {
        r["media_ref"]: r["media_type"]
        for r in multimodal.media_refs_from_documents(df).collect()
    }
    assert got == {"x/a.png": "image", "x/b.mp4": "video", "x/c.ogg": "audio", "x/d": "unknown"}


def test_payload_and_features(spark, docs):
    media = multimodal.synth_payloads(multimodal.media_refs_from_documents(docs))
    rows = media.collect()
    assert all(len(r["payload"]) == 256 for r in rows)
    feats = multimodal.extract_features(media).collect()
    assert all(len(f["feature"]) == 8 for f in feats)
    assert all(f["n_bytes"] == 256 for f in feats)
    # deterministic: same ref → same payload → same feature
    again = multimodal.extract_features(media).collect()
    assert {f["media_ref"]: f["feature"] for f in feats} == {
        f["media_ref"]: f["feature"] for f in again
    }


def test_video_frame_sampling_shape(spark):
    df = spark.createDataFrame(
        [("x/v.mp4", "video", bytes(range(64)), None)],
        multimodal.MEDIA,
    )
    out = multimodal.extract_features(df, n_frames=4).collect()[0]
    assert out["media_type"] == "video"
    assert len(out["feature"]) == 4  # one pooled value per sampled frame
