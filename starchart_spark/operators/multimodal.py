"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The crawl's media spans (``spans.kind = 'media'``) reference avatars/assets
(e.g. Gitea ``avatar_url``, /root/reference/forge/gitea/src/schema.rs — the
reference stores the URL, never the bytes). A training-data pipeline needs
the bytes too, so the engine models fetched media as:

    media(media_ref string, media_type string, payload binary,
          meta struct<width int, height int, duration_ms int, codec string>)

All Spark-side plumbing here is real and tested — schema, partitioning,
Arrow batch shapes, UDF signatures. The actual codecs (PIL/libav/ffmpeg) are
NOT in this container, so the decode kernels are deterministic fakes behind
``_decode_image_bytes`` / ``_sample_frames`` marked STUB; swapping in a real
decoder changes only those two pure functions, nothing in the dataflow.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)

MEDIA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def media_type_col(ref) -> F.Column:
    """Coarse media type from the URL extension — shared by the standalone
    work-list extractor below and the engine's media-frontier discovery
    (crawl/engine.py, discover_media)."""
    c = F.col(ref) if isinstance(ref, str) else ref
    ext = F.lower(F.regexp_extract(c, r"\.([a-zA-Z0-9]+)$", 1))
    return (
        F.when(ext.isin("png", "jpg", "jpeg", "gif", "webp"), "image")
        .when(ext.isin("mp3", "ogg", "wav", "flac"), "audio")
        .when(ext.isin("mp4", "webm", "mkv", "avi"), "video")
        .otherwise("unknown")
    )


def media_refs_from_documents(docs: DataFrame) -> DataFrame:
    """Extract the media work-list from the interleaved spans: one row per
    distinct media_ref, typed by extension. Pure JVM ops; span order is
    irrelevant here (set semantics), so no re-sort needed."""
    media = docs.select(
        F.explode(F.filter("spans", lambda s: s["kind"] == F.lit("media"))).alias("s")
    ).select(F.col("s.media_ref").alias("media_ref"))
    return media.dropDuplicates(["media_ref"]).withColumn(
        "media_type", media_type_col("media_ref")
    )


def synth_payloads(media: DataFrame, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake payload per media_ref (stands in for the fetch):
    payload = repeated xxhash64(media_ref) bytes. Keeps the binary-column
    pipeline exercisable without network or codec libs."""
    h = F.xxhash64("media_ref")
    rep = payload_bytes // 8
    hexs = F.lpad(F.hex(h), 16, "0")
    return media.withColumn(
        "payload", F.to_binary(F.repeat(hexs, rep), F.lit("hex"))
    ).withColumn(
        "meta",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ),
    )


# ---------------------------------------------------------------------------
# decode / feature kernels — STUBS (no codec libs in this container)
# ---------------------------------------------------------------------------

def _decode_image_bytes(payload: bytes) -> np.ndarray:
    """STUB decode: real impl = PIL.Image.open(BytesIO(payload)).
    Deterministic fake: interpret bytes as an 8×8 grayscale tile."""
    if payload is None:
        raise NotImplementedError("media fetch not available in this environment")
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return arr.reshape(8, 8).astype(np.float32) / 255.0


def _sample_frames(payload: bytes, n_frames: int) -> np.ndarray:
    """STUB video frame sampling: real impl = pyav/ffmpeg keyframe grab.
    Deterministic fake: n_frames rolled views of the fake image."""
    img = _decode_image_bytes(payload)
    return np.stack([np.roll(img, i, axis=0) for i in range(n_frames)])


def extract_features(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Decode → feature-extract over Arrow batches (`mapInPandas`).

    The feature is a tiny mean-pooled vector per media item — the real
    pipeline would swap a model forward pass into the same batch loop.
    Partitioning: inherit upstream (media table is laid out by
    bucket(media_ref) at scale so one slow asset can't skew a partition
    beyond maxPartitionBytes).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats, nbytes = [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                if mtype == "video":
                    frames = _sample_frames(payload, n_frames)
                    feat = frames.mean(axis=(1, 2))
                else:
                    img = _decode_image_bytes(payload)
                    feat = img.mean(axis=0)
                feats.append(feat.astype(np.float32))
                nbytes.append(len(payload) if payload is not None else 0)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "n_bytes": np.asarray(nbytes, dtype=np.int64),
                    "feature": [list(map(float, f)) for f in feats],
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)
