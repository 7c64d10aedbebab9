"""Mimic the driver's correctness gate locally: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count + order-insensitive values (columns sorted by name, like the
driver's value-hash)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bool):
        return int(v)
    return v


def _sort_key(row):
    # None-safe (and mixed-type-safe: float columns may normalize NaN to
    # the string "nan"): order by (is-null, type-name, value) per cell.
    return tuple(
        (v is None, type(v).__name__, v if v is not None else "") for v in row
    )


def _spark_rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(_norm(r[c]) for c in cols) for r in df.collect()), key=_sort_key
    )


def _duck_rows(con, sql):
    rel = con.sql(sql)
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm(row[i]) for i in order) for row in rel.fetchall()),
        key=_sort_key,
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"source", "lang_pred", "n_docs", "avg_quality", "total_tokens"}


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_against_oracle(spark, ddb, name):
    fn = entry_mod.queries()[name]
    sdf = fn(spark, SF_DIR)
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        assert sdf.count() >= 0  # rows-only check, like the driver
        return
    got = _spark_rows(sdf)
    want = _duck_rows(ddb, oracles[name])
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert got == want, f"{name}: value mismatch"
