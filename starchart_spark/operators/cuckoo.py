"""Partitioned cuckoo filters — the deletable variant of the seen-set filter.

The reference supports entity deletion (``delete_user`` /
``delete_repository``, /root/reference/db/db-sqlx-sqlite/src/lib.rs:677-733;
trait db/db-core/src/lib.rs:196,223,226). A bloom filter cannot forget, so
buckets whose seen-set sees deletes use a cuckoo filter instead: fingerprints
can be removed without rebuilding.

Same partitioning and contract as operators/bloom.py: one filter per
``host_bucket``, "maybe seen" must be confirmed exactly, "definitely new"
skips the join; deletion of a present key never leaves a false negative for
*other* keys (standard cuckoo property).

The builder's eviction loop is per-item Python, but it runs only at
checkpoint-build time over one bucket's keys (not in the per-row probe hot
path, which is vectorized numpy). Probe throughput is what matters at
10^10 scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

SLOTS = 4
MAX_KICKS = 500
_FP_MIX = np.uint64(0x5BD1E995)

FILTER_SCHEMA = T.StructType(
    [
        T.StructField("host_bucket", T.IntegerType(), False),
        T.StructField("n_buckets", T.LongType(), False),
        T.StructField("n_keys", T.LongType(), False),
        T.StructField("table", T.BinaryType(), False),
    ]
)


_FP_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _fingerprint(h: np.ndarray) -> np.ndarray:
    # mix before truncating: raw top bits of small/sequential keys collide
    mixed = (h ^ (h >> np.uint64(32))) * _FP_GOLDEN
    fp = ((mixed >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1  # 0 marks an empty slot
    return fp


def _index2(i1: np.ndarray, fp: np.ndarray, nb: int) -> np.ndarray:
    return (i1 ^ (fp.astype(np.uint64) * _FP_MIX)) % np.uint64(nb)


class CuckooTable:
    """In-memory cuckoo filter over one partition's keys."""

    def __init__(self, n_keys: int, load: float = 0.84):
        nb = 1
        while nb * SLOTS * load < max(n_keys, SLOTS):
            nb <<= 1
        self.nb = nb
        self.table = np.zeros((nb, SLOTS), dtype=np.uint16)
        self.rng = np.random.default_rng(42)  # deterministic eviction choice

    def _slots(self, h: np.uint64) -> tuple[int, int, int]:
        fp = int(_fingerprint(np.array([h], dtype=np.uint64))[0])
        i1 = int(h % np.uint64(self.nb))
        i2 = int(_index2(np.array([i1], dtype=np.uint64), np.array([fp], dtype=np.uint16), self.nb)[0])
        return fp, i1, i2

    def add(self, h: int) -> bool:
        fp, i1, i2 = self._slots(np.uint64(h))
        for i in (i1, i2):
            free = np.nonzero(self.table[i] == 0)[0]
            if free.size:
                self.table[i, free[0]] = fp
                return True
        i = i1 if int(self.rng.integers(2)) == 0 else i2
        for _ in range(MAX_KICKS):
            s = int(self.rng.integers(SLOTS))
            fp, self.table[i, s] = int(self.table[i, s]), fp
            i = int(
                _index2(np.array([i], dtype=np.uint64), np.array([fp], dtype=np.uint16), self.nb)[0]
            )
            free = np.nonzero(self.table[i] == 0)[0]
            if free.size:
                self.table[i, free[0]] = fp
                return True
        return False  # caller should rebuild larger

    def delete(self, h: int) -> bool:
        fp, i1, i2 = self._slots(np.uint64(h))
        for i in (i1, i2):
            hit = np.nonzero(self.table[i] == fp)[0]
            if hit.size:
                self.table[i, hit[0]] = 0
                return True
        return False

    def contains_vec(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.view(np.uint64)
        fp = _fingerprint(h)
        i1 = h % np.uint64(self.nb)
        i2 = _index2(i1, fp, self.nb)
        t = self.table
        in1 = (t[i1.astype(np.int64)] == fp[:, None]).any(axis=1)
        in2 = (t[i2.astype(np.int64)] == fp[:, None]).any(axis=1)
        return in1 | in2


def build(
    seen: DataFrame,
    hash_col: str = "key_hash",
    bucket_col: str = "host_bucket",
) -> DataFrame:
    """One cuckoo filter per host_bucket, built distributively."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        hashes = pdf[hash_col].to_numpy(dtype=np.int64).view(np.uint64)
        ct = CuckooTable(len(hashes))
        for h in hashes:
            if not ct.add(int(h)):  # pragma: no cover — load factor guards this
                ct = CuckooTable(len(hashes) * 2)
                for h2 in hashes:
                    ct.add(int(h2))
                break
        return pd.DataFrame(
            {
                "host_bucket": [int(pdf[bucket_col].iloc[0])],
                "n_buckets": [ct.nb],
                "n_keys": [len(hashes)],
                "table": [ct.table.tobytes()],
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
    """Vectorized probe, same contract as bloom.probe."""
    local: dict[int, CuckooTable] = {}
    for r in filters.collect():
        ct = CuckooTable.__new__(CuckooTable)
        ct.nb = int(r["n_buckets"])
        ct.table = np.frombuffer(r["table"], dtype=np.uint16).reshape(ct.nb, SLOTS).copy()
        local[int(r["host_bucket"])] = ct
    bc = spark.sparkContext.broadcast(local)

    @pandas_udf(T.BooleanType())
    def _probe(bucket: pd.Series, hashes: pd.Series) -> pd.Series:
        flt = bc.value
        b = bucket.to_numpy(dtype=np.int64)
        h = hashes.to_numpy(dtype=np.int64)
        out = np.zeros(len(b), dtype=bool)
        for bk in np.unique(b):
            sel = b == bk
            ct = flt.get(int(bk))
            if ct is not None:
                out[sel] = ct.contains_vec(h[sel])
        return pd.Series(out)

    return candidates.withColumn(out_col, _probe(F.col(bucket_col), F.col(hash_col)))
