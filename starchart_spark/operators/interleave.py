"""Interleaved media↔text context pairing — the multimodal-pretraining
extraction step over span documents.

Interleaved web documents (the corpus shape this engine crawls: ordered
``spans: array<struct<kind, text, media_ref, offset>>`` per doc,
crawl/corpus.py) feed image-text pretraining two ways: OBELICS (Laurençon
et al. 2023) keeps the full interleaved sequence, MMC4 (Zhu et al. 2023)
attaches each image to surrounding text. This module is the second form:
for every media span, the nearest preceding and following text spans in
document order, plus position signals (span offset, #text spans before,
#media in doc) that downstream pairing/packing consumes.

Spark-first shape — ONE explode + ONE exchange:

- ``posexplode`` the spans array (order is the array order, which the
  corpus contract guarantees is offset order; ``offset`` is still carried
  and used as the window key so pre-sorted-ness is semantics, not trust);
- one window partitioned by doc orders all spans; ``before_text`` /
  ``after_text`` are conditional ``last``/``first`` with ``ignorenulls``
  over the preceding/following frames — no self-join, no second shuffle;
- media rows filter out AFTER the window (text rows exist only to be
  seen by the frames), so the whole operator is scan → explode → one
  window exchange → filter.

Boundary semantics: a media span with no text before it (lead media) gets
NULL ``before_text``; trailing media gets NULL ``after_text`` — NULLs are
the honest answer (MMC4 drops or cross-attends these), and the driver
gate exercises both via media-first layouts.

At 100 TB the window key is (doc_id), i.e. perfectly parallel and skewless
(docs are bounded; there is no mega-doc the way there is a mega-host), and
the shuffle carries only (doc key, span) rows — media payloads stay refs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def media_text_pairs(
    docs: DataFrame,
    doc_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """(doc_id, media_ref, offset, before_text, after_text, n_text_before,
    n_media_in_doc) — one row per media span, in-document context attached.

    ``docs`` carries ``spans_col: array<struct<kind, text, media_ref,
    offset>>`` (the interleaved corpus shape, crawl/corpus.py). Ordering
    inside a doc is by ``offset`` (ties by array position, which the
    posexplode index supplies).
    """
    spans = docs.select(
        F.col(doc_col),
        F.posexplode(spans_col).alias("pos", "span"),
    ).select(
        doc_col,
        "pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )
    w = Window.partitionBy(doc_col).orderBy("offset", "pos")
    # context = any TEXT-BEARING span (the corpus interleaves kinds
    # api_json/html/media — crawl/corpus.py; the struct contract is that
    # text spans carry text and media spans carry media_ref, so nullness,
    # not the kind label, decides which side of the pairing a span is on)
    text_only = F.when(F.col("text").isNotNull(), F.col("text"))
    media_flag = F.when(F.col("kind") == "media", 1).otherwise(0)
    before = F.last(text_only, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    after = F.first(text_only, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    n_text_before = F.sum(
        F.when(F.col("text").isNotNull(), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, -1))
    n_media = F.sum(media_flag).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        spans.select(
            doc_col,
            "kind",
            "media_ref",
            "offset",
            before.alias("before_text"),
            after.alias("after_text"),
            F.coalesce(n_text_before, F.lit(0)).cast("int").alias("n_text_before"),
            n_media.cast("int").alias("n_media_in_doc"),
        )
        .filter(F.col("kind") == "media")
        .drop("kind")
    )


def multimodal_token_costs(
    docs: DataFrame,
    media_token_cost: int = 64,
    doc_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """(doc_id, n_text_tokens, n_media, mm_tokens) — the sequence-packing
    cost of an interleaved document: whitespace tokens over its text
    spans plus a FIXED per-media token budget (what vision encoders emit
    per image — e.g. 64/256 patch tokens — is a constant of the model,
    not the payload, so the cost is known before any decode). Feed
    ``mm_tokens`` to the packer in place of plain text counts; documents
    whose media alone exceed the context length surface here (mm_tokens
    vs context_len is the caller's drop/split decision).

    ONE explode + ONE doc-keyed hash aggregate (map-side partials); no
    window, no Python."""
    from starchart_spark.operators import text as text_ops

    spans = docs.select(
        F.col(doc_col), F.explode(spans_col).alias("span")
    ).select(
        doc_col,
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
    )
    n_text = F.sum(
        F.when(
            F.col("text").isNotNull(), text_ops.token_count(F.col("text"))
        ).otherwise(0)
    ).cast("long")
    n_media = F.sum(
        F.when(F.col("kind") == "media", 1).otherwise(0)
    ).cast("long")
    return (
        spans.groupBy(doc_col)
        .agg(n_text.alias("n_text_tokens"), n_media.alias("n_media"))
        .withColumn(
            "mm_tokens",
            F.col("n_text_tokens")
            + F.col("n_media") * F.lit(int(media_token_cost)),
        )
    )
