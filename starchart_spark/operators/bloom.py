"""Partitioned bloom filters for the URL-seen set (north_rule).

One bloom filter per ``host_bucket`` partition, built distributively with
``applyInPandas`` (numpy bit ops — no per-row Python), persisted as a small
parquet table next to the seen-set table, and maintained *incrementally*:
each batch ORs only the newly committed keys into the touched buckets'
bitmaps (O(new keys), not O(|seen|)).

Probing is **co-partitioned, never broadcast**: candidates are cogrouped
with the filter table on ``host_bucket``, so each task receives exactly one
bucket's candidates plus that bucket's single filter row. Driver memory and
per-task transfer stay O(one bucket) — at the 10^10-key design point
(B=4096 buckets, ~10 bits/key ⇒ ~3 MB/bucket) no ~12 GB driver collect or
full-cluster broadcast ever happens.

Contract (SURVEY.md §2.2): the filter layer only changes *cost*, never
*answers* — a probe returns "maybe seen" (must be confirmed by the exact
anti-join) or "definitely new" (skips the join). False-positive rate is a
tuning knob; false negatives are impossible for keys committed at or before
the filter snapshot (the engine rebuilds the filter table on resume if it
lags the seen-set). Hash positions use Kirsch-Mitzenmacher double hashing
off the 64-bit xxhash64 key already computed JVM-side (functions/urls.py).

Sizing: bitmaps are provisioned with 2× headroom (``_capacity_bits``); a
bucket whose key count outgrows its capacity is flagged by ``overfull`` and
rebuilt from that bucket's keys only — amortized-doubling, so per-batch
filter maintenance cost stays O(new keys).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_MIX = np.uint64(0x9E3779B97F4A7C15)

DEFAULT_BITS_PER_KEY = 10

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


def _capacity_bits(n_keys: int, bits_per_key: int) -> int:
    """Bitmap size with 2x headroom so incremental inserts amortize."""
    return max(1024, int(n_keys) * bits_per_key * 2)


def _k_hashes(bits_per_key: int) -> int:
    return max(1, int(round(bits_per_key * 0.6931)))  # ln 2


def _set_bits(bitmap: np.ndarray, hashes: np.ndarray, k: int, m: int) -> None:
    pos = _positions(hashes, k, m).ravel()
    np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))


def build(
    seen: DataFrame,
    hash_col: str = "key_hash",
    bucket_col: str = "host_bucket",
    bits_per_key: int = DEFAULT_BITS_PER_KEY,
) -> DataFrame:
    """Build one bloom filter per bucket from the seen-set table.

    Distributed: each bucket's keys are grouped to one task which sets bits
    with numpy. Returns the FILTER_SCHEMA DataFrame (persist beside the
    table; ``update`` then maintains it incrementally).
    """

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        hashes = pdf[hash_col].to_numpy(dtype=np.int64).view(np.uint64)
        n = len(hashes)
        m = _capacity_bits(n, bits_per_key)
        k = _k_hashes(bits_per_key)
        bitmap = np.zeros((m + 7) // 8, dtype=np.uint8)
        _set_bits(bitmap, hashes, k, m)
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


def update(
    filters: DataFrame,
    new_keys: DataFrame,
    hash_col: str = "key_hash",
    bucket_col: str = "host_bucket",
    bits_per_key: int = DEFAULT_BITS_PER_KEY,
) -> DataFrame:
    """OR newly committed keys into the touched buckets only — O(new keys).

    Buckets with no new keys pass through untouched (their bitmaps never
    leave the JVM); buckets that have no filter row yet get a fresh one.
    Inserting past capacity degrades FPR but never creates false negatives;
    ``overfull`` flags such buckets for a per-bucket rebuild.
    """
    keys = new_keys.select(bucket_col, hash_col)
    touched_buckets = keys.select(bucket_col).distinct()
    untouched = filters.join(touched_buckets, bucket_col, "left_anti")
    touched = filters.join(touched_buckets, bucket_col, "left_semi")

    def _upd(flt_pdf: pd.DataFrame, keys_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(keys_pdf):  # filter row semi-joined on touched ⇒ unreachable
            return flt_pdf
        hashes = keys_pdf[hash_col].to_numpy(dtype=np.int64).view(np.uint64)
        if len(flt_pdf):
            m = int(flt_pdf["m_bits"].iloc[0])
            k = int(flt_pdf["k_hashes"].iloc[0])
            n0 = int(flt_pdf["n_keys"].iloc[0])
            bitmap = np.frombuffer(flt_pdf["bitmap"].iloc[0], dtype=np.uint8).copy()
            bucket = int(flt_pdf[bucket_col].iloc[0])
        else:
            m = _capacity_bits(len(hashes), bits_per_key)
            k = _k_hashes(bits_per_key)
            n0 = 0
            bitmap = np.zeros((m + 7) // 8, dtype=np.uint8)
            bucket = int(keys_pdf[bucket_col].iloc[0])
        _set_bits(bitmap, hashes, k, m)
        return pd.DataFrame(
            {
                "host_bucket": [bucket],
                "m_bits": [m],
                "k_hashes": [k],
                "n_keys": [n0 + len(hashes)],
                "bitmap": [bitmap.tobytes()],
            }
        )

    updated = (
        touched.groupBy(bucket_col)
        .cogroup(keys.groupBy(bucket_col))
        .applyInPandas(_upd, FILTER_SCHEMA)
    )
    return untouched.unionByName(updated)


def overfull(filters: DataFrame, bits_per_key: int = DEFAULT_BITS_PER_KEY) -> DataFrame:
    """Buckets whose key count outgrew the bitmap's provisioned capacity
    (FPR above target) — rebuild these from the seen table, bucket-local."""
    return filters.filter(
        F.col("n_keys") * F.lit(bits_per_key) > F.col("m_bits")
    ).select("host_bucket")


def probe(
    spark: SparkSession,
    candidates: DataFrame,
    filters: DataFrame,
    hash_col: str = "key_hash",
    bucket_col: str = "host_bucket",
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Add ``out_col``: True = maybe in the seen set, False = definitely new.

    Co-partitioned probe: candidates cogrouped with the filter table on
    ``host_bucket`` — each task sees one bucket's candidate rows and that
    bucket's single filter row. No driver collect, no broadcast of the
    filter set (the round-1 broadcast-all formulation was a scale-killer at
    the 10^10-key design point). Buckets with no filter row (nothing ever
    committed there) probe False.
    """
    cand_cols = list(candidates.columns)
    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField(out_col, T.BooleanType(), False)]
    )

    def _probe(cand_pdf: pd.DataFrame, flt_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cand_pdf):  # filter-only group: emit nothing
            cand_pdf[out_col] = pd.Series([], dtype=bool)
            return cand_pdf[cand_cols + [out_col]]
        if not len(flt_pdf):
            return cand_pdf.assign(**{out_col: False})[cand_cols + [out_col]]
        m = int(flt_pdf["m_bits"].iloc[0])
        k = int(flt_pdf["k_hashes"].iloc[0])
        bitmap = np.frombuffer(flt_pdf["bitmap"].iloc[0], dtype=np.uint8)
        h = cand_pdf[hash_col].to_numpy(dtype=np.int64).view(np.uint64)
        pos = _positions(h, k, m)
        bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return cand_pdf.assign(**{out_col: bits.all(axis=1)})[cand_cols + [out_col]]

    return (
        candidates.groupBy(bucket_col)
        .cogroup(filters.groupBy(bucket_col))
        .applyInPandas(_probe, out_schema)
    )


# ---------------------------------------------------------------------------
# store-backed probe: the frontier-scale path
# ---------------------------------------------------------------------------
#
# The cogroup probe above moves the candidate rows through one Arrow
# round-trip per bucket — fine for engine micro-batches (thousands of rows),
# wasteful for a 10^7+-row frontier sweep. The store-backed variant persists
# one small file per bucket next to the seen-set table (the Iceberg
# side-file pattern) and probes with a scalar Arrow UDF: no shuffle, no
# broadcast, no driver collect — each long-lived worker lazily loads only
# the buckets that appear in its partitions and caches them across batches.

_STORE_CACHE: dict = {}  # (store_dir, bucket) -> (m, k, bitmap) per worker


def save_store(filters: DataFrame, store_dir: str) -> None:
    """Write one ``<bucket>.bloom`` file (24-byte header + bitmap) per
    bucket. Executors write their own partitions (shared filesystem /
    object store at cluster scale); a store dir is immutable once written —
    write a fresh epoch-named dir per filter generation."""
    os.makedirs(store_dir, exist_ok=True)

    def _write(rows) -> None:
        for r in rows:
            path = os.path.join(store_dir, f"{int(r['host_bucket'])}.bloom")
            with open(path, "wb") as fh:
                fh.write(
                    np.array(
                        [r["m_bits"], r["k_hashes"], r["n_keys"]], dtype=np.int64
                    ).tobytes()
                )
                fh.write(bytes(r["bitmap"]))

    filters.foreachPartition(_write)


def probe_with_store(
    candidates: DataFrame,
    store_dir: str,
    hash_col: str = "key_hash",
    bucket_col: str = "host_bucket",
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Same contract as ``probe`` (missing bucket file ⇒ definitely new),
    via the persisted per-bucket store. Narrow: only (bucket, hash) cross
    the Arrow boundary, candidates keep their partitioning."""

    @pandas_udf(T.BooleanType())
    def _probe(bucket: pd.Series, hashes: pd.Series) -> pd.Series:
        b = bucket.to_numpy(dtype=np.int64)
        h = hashes.to_numpy(dtype=np.int64).view(np.uint64)
        out = np.zeros(len(b), dtype=bool)
        for bk in np.unique(b):
            key = (store_dir, int(bk))
            entry = _STORE_CACHE.get(key)
            if entry is None:
                path = os.path.join(store_dir, f"{int(bk)}.bloom")
                if os.path.exists(path):
                    raw = np.fromfile(path, dtype=np.uint8)
                    hdr = raw[:24].view(np.int64)
                    entry = (int(hdr[0]), int(hdr[1]), raw[24:])
                else:
                    entry = (0, 0, None)
                _STORE_CACHE[key] = entry
            m, k, bitmap = entry
            if bitmap is None:
                continue
            sel = b == bk
            pos = _positions(h[sel], k, m)
            bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
            out[sel] = bits.all(axis=1)
        return pd.Series(out)

    return candidates.withColumn(out_col, _probe(F.col(bucket_col), F.col(hash_col)))
