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
from pyspark.sql import types as T

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
        path: list[tuple[int, int]] = []
        for _ in range(MAX_KICKS):
            s = int(self.rng.integers(SLOTS))
            path.append((i, s))
            fp, self.table[i, s] = int(self.table[i, s]), fp
            i = int(
                _index2(np.array([i], dtype=np.uint64), np.array([fp], dtype=np.uint16), self.nb)[0]
            )
            free = np.nonzero(self.table[i] == 0)[0]
            if free.size:
                self.table[i, free[0]] = fp
                return True
        # failed insert: UNDO the eviction chain in reverse. Without the
        # rollback the last displaced fingerprint is simply lost — a false
        # negative for a previously-added key, which a membership filter
        # must never produce (found by the hypothesis property test).
        for bi, s in reversed(path):
            fp, self.table[bi, s] = int(self.table[bi, s]), fp
        return False  # table unchanged; caller should rebuild larger

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


def _table_from_row(row: pd.Series) -> CuckooTable:
    ct = CuckooTable.__new__(CuckooTable)
    ct.nb = int(row["n_buckets"])
    ct.table = (
        np.frombuffer(row["table"], dtype=np.uint16).reshape(ct.nb, SLOTS).copy()
    )
    ct.rng = np.random.default_rng(42)
    return ct


def probe(
    spark: SparkSession,
    candidates: DataFrame,
    filters: DataFrame,
    hash_col: str = "key_hash",
    bucket_col: str = "host_bucket",
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Co-partitioned probe, same contract and shape as bloom.probe: each
    task gets one bucket's candidates plus that bucket's filter row — no
    driver collect, no broadcast of all tables."""
    cand_cols = list(candidates.columns)
    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField(out_col, T.BooleanType(), False)]
    )

    def _probe(cand_pdf: pd.DataFrame, flt_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cand_pdf):
            cand_pdf[out_col] = pd.Series([], dtype=bool)
            return cand_pdf[cand_cols + [out_col]]
        if not len(flt_pdf):
            return cand_pdf.assign(**{out_col: False})[cand_cols + [out_col]]
        ct = _table_from_row(flt_pdf.iloc[0])
        h = cand_pdf[hash_col].to_numpy(dtype=np.int64)
        return cand_pdf.assign(**{out_col: ct.contains_vec(h)})[cand_cols + [out_col]]

    return (
        candidates.groupBy(bucket_col)
        .cogroup(filters.groupBy(bucket_col))
        .applyInPandas(_probe, out_schema)
    )


def update(
    filters: DataFrame,
    changes: DataFrame,
    hash_col: str = "key_hash",
    bucket_col: str = "host_bucket",
    op_col: str = "op",
) -> DataFrame:
    """Apply adds/deletes per bucket — the deletable counterpart of
    bloom.update. ``changes`` carries (bucket, hash, op) with op in
    {'add','delete'}, applied in input order within each bucket. Buckets
    without changes pass through untouched; new buckets get fresh tables;
    a table that can't absorb its adds is rebuilt at 2x capacity from its
    own surviving fingerprints' keys — per-bucket, never global."""
    ch = changes.select(bucket_col, hash_col, op_col)
    touched_buckets = ch.select(bucket_col).distinct()
    untouched = filters.join(touched_buckets, bucket_col, "left_anti")
    touched = filters.join(touched_buckets, bucket_col, "left_semi")

    def _upd(flt_pdf: pd.DataFrame, ch_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(ch_pdf):
            return flt_pdf
        bucket = int(ch_pdf[bucket_col].iloc[0])
        n_add = int((ch_pdf[op_col] == "add").sum())
        if len(flt_pdf):
            ct = _table_from_row(flt_pdf.iloc[0])
            n0 = int(flt_pdf["n_keys"].iloc[0])
        else:
            ct = CuckooTable(max(n_add * 2, SLOTS))
            n0 = 0
        n = n0
        for h, op in zip(ch_pdf[hash_col], ch_pdf[op_col]):
            if op == "add":
                if not ct.add(int(h)):  # pragma: no cover — load factor guards
                    # fingerprints alone can't re-derive keys; rebuild from
                    # the seen table via build() is the safe path
                    raise RuntimeError(
                        f"cuckoo bucket {bucket} over capacity; rebuild via build()"
                    )
                n += 1
            else:
                if ct.delete(int(h)):
                    n -= 1
        return pd.DataFrame(
            {
                "host_bucket": [bucket],
                "n_buckets": [ct.nb],
                "n_keys": [n],
                "table": [ct.table.tobytes()],
            }
        )

    updated = (
        touched.groupBy(bucket_col)
        .cogroup(ch.groupBy(bucket_col))
        .applyInPandas(_upd, FILTER_SCHEMA)
    )
    return untouched.unionByName(updated)
