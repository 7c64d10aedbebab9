"""Partitioned bloom filters for the URL-seen set (north_rule).

One bloom filter per ``host_bucket`` partition, built distributively with
``applyInPandas`` (numpy bit ops — no per-row Python), persisted as a small
parquet table next to the seen-set table, and rebuilt lazily from the table
on resume. Probing is a vectorized pandas UDF against a broadcast of the
per-bucket bitmaps.

Contract (SURVEY.md §2.2): the filter layer only changes *cost*, never
*answers* — a probe returns "maybe seen" (must be confirmed by the exact
anti-join) or "definitely new" (skips the join). False-positive rate is a
tuning knob; false negatives are impossible because every committed key is
inserted before the filter is persisted.

Scale: at 10^10 URLs with B=4096 buckets and ~10 bits/key, each bucket's
bitmap is ~3 GB/4096 ≈ 3 MB — broadcastable; executors only need the buckets
of the partitions they probe, and Spark's torrent broadcast handles the
fan-out. Hash positions use Kirsch-Mitzenmacher double hashing off the
64-bit xxhash64 key already computed JVM-side (functions/urls.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_MIX = np.uint64(0x9E3779B97F4A7C15)

FILTER_SCHEMA = T.StructType(
    [
        T.StructField("host_bucket", T.IntegerType(), False),
        T.StructField("m_bits", T.LongType(), False),
        T.StructField("k_hashes", T.IntegerType(), False),
        T.StructField("n_keys", T.LongType(), False),
        T.StructField("bitmap", T.BinaryType(), False),
    ]
)


def _positions(hashes: np.ndarray, k: int, m: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: h1 + i*h2 mod m."""
    h = hashes.astype(np.uint64)
    h1 = h
    h2 = (h ^ (h >> np.uint64(33))) * _MIX | np.uint64(1)  # odd => full cycle
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).astype(np.int64)


def _params(n_keys: int, bits_per_key: int) -> tuple[int, int]:
    m = max(64, int(n_keys) * bits_per_key)
    k = max(1, int(round(bits_per_key * 0.6931)))  # ln 2
    return m, k


def build(
    seen: DataFrame,
    hash_col: str = "key_hash",
    bucket_col: str = "host_bucket",
    bits_per_key: int = 10,
) -> DataFrame:
    """Build one bloom filter per bucket from the seen-set table.

    Distributed: each bucket's keys are grouped to one task which sets bits
    with numpy. Returns the FILTER_SCHEMA DataFrame (persist with
    ``df.write.parquet`` beside the table; cheap to rebuild on resume).
    """

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        hashes = pdf[hash_col].to_numpy(dtype=np.int64).view(np.uint64)
        n = len(hashes)
        m, k = _params(n, bits_per_key)
        bitmap = np.zeros((m + 7) // 8, dtype=np.uint8)
        pos = _positions(hashes, k, m).ravel()
        np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pd.DataFrame(
            {
                "host_bucket": [int(pdf[bucket_col].iloc[0])],
                "m_bits": [m],
                "k_hashes": [k],
                "n_keys": [n],
                "bitmap": [bitmap.tobytes()],
            }
        )

    return (
        seen.select(bucket_col, hash_col)
        .groupBy(bucket_col)
        .applyInPandas(_build, FILTER_SCHEMA)
    )


def probe(
    spark: SparkSession,
    candidates: DataFrame,
    filters: DataFrame,
    hash_col: str = "key_hash",
    bucket_col: str = "host_bucket",
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Add ``out_col``: True = maybe in the seen set, False = definitely new.

    Buckets with no filter row (nothing ever committed there) probe False.
    """
    local = {
        int(r["host_bucket"]): (
            int(r["m_bits"]),
            int(r["k_hashes"]),
            np.frombuffer(r["bitmap"], dtype=np.uint8),
        )
        for r in filters.collect()
    }
    bc = spark.sparkContext.broadcast(local)

    @pandas_udf(T.BooleanType())
    def _probe(bucket: pd.Series, hashes: pd.Series) -> pd.Series:
        flt = bc.value
        b = bucket.to_numpy(dtype=np.int64)
        h = hashes.to_numpy(dtype=np.int64).view(np.uint64)
        out = np.zeros(len(b), dtype=bool)
        for bk in np.unique(b):
            sel = b == bk
            entry = flt.get(int(bk))
            if entry is None:
                continue
            m, k, bitmap = entry
            pos = _positions(h[sel], k, m)
            bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
            out[sel] = bits.all(axis=1)
        return pd.Series(out)

    return candidates.withColumn(out_col, _probe(F.col(bucket_col), F.col(hash_col)))
