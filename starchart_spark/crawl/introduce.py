"""Introducer bootstrap: instance discovery + federated data exchange (P9,
S12, S13, D10).

The reference's introducer loop (/root/reference/src/introduce.rs:137-251)
periodically: (1) introduces itself to every known peer Starchart,
(2) pulls each peer's forge list page by page and inserts unseen forges
tagged with the source instance (``import_forges`` :59-87, INSERT OR IGNORE
``add_starchart_to_introducer`` db/db-sqlx-sqlite/src/lib.rs:885-897),
(3) pulls each peer's mini-index and replaces its prior copy (:109-117,
delete-then-insert db/.../lib.rs:977-997), then sleeps ``introducer.wait``
(config/default.toml:44).

Spark re-expression: peers are warehouses reachable as DataFrames (in
deployment: their published REST endpoints read into DataFrames at the
driver boundary); every sink is the same MERGE machinery the crawl uses —
one periodic batch job, no new operator shapes. All flows are idempotent
(D9): replaying a bootstrap changes nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from starchart_spark.crawl import federate
from starchart_spark.snapstore import SnapshotTable

# reference: starchart_introducer table (migrations/20230228083200_*.sql)
INTRODUCERS = T.StructType(
    [
        T.StructField("instance_url", T.StringType(), False),
        T.StructField("imported", T.BooleanType(), False),  # is_starchart_imported
    ]
)

MINI_INDEX = T.StructType(
    [
        T.StructField("starchart_instance", T.StringType(), False),
        T.StructField("mini_index", T.StringType(), False),
    ]
)


def introducers_table(path: str) -> SnapshotTable:
    return SnapshotTable(path, INTRODUCERS, ["instance_url"])


def mini_index_table(path: str) -> SnapshotTable:
    return SnapshotTable(path, MINI_INDEX, ["starchart_instance"])


def introduce(
    store: SnapshotTable, spark: SparkSession, instance_url: str, imported: bool = False
) -> bool:
    """INSERT OR IGNORE the peer instance (D10,
    db/db-sqlx-sqlite/src/lib.rs:885-897). Returns True if newly added."""
    row = spark.createDataFrame([(instance_url, imported)], INTRODUCERS)
    _, ins = store.merge_insert(spark, row, {"op": "introduce"})
    return ins.count() == 1


def import_forges(
    forges: SnapshotTable,
    spark: SparkSession,
    peer_forges: DataFrame,
    source_instance: str,
) -> int:
    """S12 (src/introduce.rs:59-87): merge a peer's forge list, unseen rows
    only, tagged ``imported=true`` + the source starchart instance. The
    peer's own imports are excluded first (the reference requests
    ``/forges/list`` without imports) so lineage never chains through a
    middleman."""
    rows = peer_forges.filter(~F.col("imported")).select(
        "hostname",
        "forge_type",
        F.lit(None).cast("long").alias("verified_on"),  # trust is not transitive
        F.lit(None).cast("long").alias("last_crawl_on"),
        F.lit(True).alias("imported"),
        F.lit(source_instance).alias("starchart_instance"),
    )
    _, ins = forges.merge_insert(
        spark, rows, {"op": "import-forges", "source": source_instance}
    )
    return ins.count()


def bootstrap(
    spark: SparkSession,
    my_forges: SnapshotTable,
    my_introducers: SnapshotTable,
    my_mini_index: SnapshotTable,
    peers: dict[str, dict],
) -> dict:
    """One introducer round (src/introduce.rs:173-251): for every peer
    ``{url: {"forges": DataFrame, "mini_index": str, "introducers": SnapshotTable}}``
    introduce ourselves both ways, import the peer's forge list, and swap
    mini-indexes. Idempotent; returns per-peer insert counts."""
    out: dict[str, dict] = {}
    for url, peer in peers.items():
        introduce(my_introducers, spark, url)
        n = import_forges(my_forges, spark, peer["forges"], url)
        federate.import_mini_index(my_mini_index, spark, url, peer["mini_index"])
        out[url] = {"forges_imported": n}
    return out
