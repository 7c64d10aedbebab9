"""SnapshotTable contract tests — ported from the reference's DB trait tests
(/root/reference/db/db-core/src/tests.rs:22-170: add/get/exists life-cycle,
INSERT OR IGNORE idempotency) and tar retention
(federate/publiccodeyml/src/lib.rs:239-262)."""

import pytest
from pyspark.sql import types as T

from starchart_spark.snapstore import SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), False),
    ]
)


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "t"), SCHEMA, ["k"])


def test_empty_read(spark, table):
    df = table.read(spark)
    assert df.count() == 0
    assert df.schema == SCHEMA


def test_merge_insert_first_writer_wins(spark, table):
    snap1, ins1 = table.merge_insert(spark, spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    assert ins1.count() == 2
    # second writer with same key 'a': ignored (INSERT OR IGNORE semantics)
    snap2, ins2 = table.merge_insert(spark, spark.createDataFrame([("a", 99), ("c", 3)], SCHEMA))
    assert {r["k"] for r in ins2.collect()} == {"c"}
    rows = {r["k"]: r["v"] for r in table.read(spark).collect()}
    assert rows == {"a": 1, "b": 2, "c": 3}
    assert snap2.snapshot_id > snap1.snapshot_id


def test_merge_noop_commits_snapshot(spark, table):
    table.merge_insert(spark, spark.createDataFrame([("a", 1)], SCHEMA))
    snap, ins = table.merge_insert(spark, spark.createDataFrame([("a", 5)], SCHEMA))
    assert ins.count() == 0
    assert snap.summary["op"] == "merge-noop"


def test_time_travel_and_rollback(spark, table):
    s1, _ = table.merge_insert(spark, spark.createDataFrame([("a", 1)], SCHEMA))
    s2, _ = table.merge_insert(spark, spark.createDataFrame([("b", 2)], SCHEMA))
    assert table.read(spark, snapshot_id=s1.snapshot_id).count() == 1
    assert table.read(spark).count() == 2
    table.rollback(s1.snapshot_id)
    assert table.read(spark).count() == 1


def test_overwrite(spark, table):
    table.merge_insert(spark, spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    table.overwrite(spark.createDataFrame([("z", 9)], SCHEMA))
    rows = {r["k"]: r["v"] for r in table.read(spark).collect()}
    assert rows == {"z": 9}


def test_expire_snapshots_retention(spark, table):
    for i in range(8):
        table.append(spark.createDataFrame([(f"k{i}", i)], SCHEMA))
    assert len(table.snapshots()) == 8
    table.expire_snapshots(keep=5)  # reference keeps newest 5 tars
    assert len(table.snapshots()) == 5
    # newest snapshot still reads the full accumulated data
    assert table.read(spark).count() == 8


def test_multi_commit_one_action(spark, tmp_path):
    """multi_commit: N tables, one write job, per-table observed counts,
    commit in listed order, files readable through each table's schema."""
    from pyspark.sql import functions as F

    from starchart_spark.snapstore import multi_commit

    schema_b = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("w", T.StringType(), True),
        ]
    )
    ta = SnapshotTable(str(tmp_path / "ta"), SCHEMA, ["k"])
    tb = SnapshotTable(str(tmp_path / "tb"), schema_b, ["k"])
    df_a = spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA)
    df_b = spark.createDataFrame([("x", None)], schema_b)

    got = multi_commit(
        spark,
        str(tmp_path / "_staging"),
        [(ta, df_a, "merge-append"), (tb, df_b, "overwrite")],
        {"batch_id": 7},
        extra_metrics={
            "n_total": F.count(F.lit(1)),
        },
    )
    assert got["n_ta"] == 2 and got["n_tb"] == 1 and got["n_total"] == 3
    assert sorted(r["k"] for r in ta.read(spark).collect()) == ["a", "b"]
    rows_b = tb.read(spark).collect()
    assert len(rows_b) == 1 and rows_b[0]["w"] is None
    assert ta.current_snapshot().summary["op"] == "merge-insert"
    assert ta.current_snapshot().summary["inserted"] == 2
    assert tb.current_snapshot().summary["batch_id"] == 7

    # second round: empty merge-append → merge-noop; overwrite replaces
    got2 = multi_commit(
        spark,
        str(tmp_path / "_staging"),
        [
            (ta, spark.createDataFrame([], SCHEMA), "merge-append"),
            (tb, spark.createDataFrame([("y", "v"), ("z", None)], schema_b), "overwrite"),
        ],
    )
    assert got2["n_ta"] == 0 and got2["n_tb"] == 2
    assert ta.current_snapshot().summary["op"] == "merge-noop"
    assert ta.read(spark).count() == 2  # unchanged
    assert sorted(r["k"] for r in tb.read(spark).collect()) == ["y", "z"]


def test_multi_commit_rejects_type_conflict(spark, tmp_path):
    bad = T.StructType([T.StructField("v", T.StringType(), True)])  # v: long in SCHEMA
    ta = SnapshotTable(str(tmp_path / "ca"), SCHEMA, ["k"])
    tc = SnapshotTable(str(tmp_path / "cc"), bad, [])
    from starchart_spark.snapstore import multi_commit

    with pytest.raises(TypeError):
        multi_commit(
            spark,
            str(tmp_path / "_st2"),
            [
                (ta, spark.createDataFrame([], SCHEMA), "append"),
                (tc, spark.createDataFrame([], bad), "append"),
            ],
        )
