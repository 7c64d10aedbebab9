"""Connected components over dup-pair graphs: label correctness on
non-trivial topologies, determinism, and the keep-representative step."""

import pytest

from starchart_spark.operators.cluster import (
    connected_components,
    dedup_keep_representative,
)


def _cc(spark, edges):
    pairs = spark.createDataFrame(edges, ["a_id", "b_id"])
    return {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(pairs).collect()
    }


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_path_graph_converges_beyond_one_hop(spark):
    # a long path needs multiple propagation rounds: 9-8-...-1
    got = _cc(spark, [(i, i + 1) for i in range(1, 9)])
    assert got == {(i, 1) for i in range(1, 10)}


def test_bridged_cliques_and_edge_order_invariance(spark):
    edges = [(5, 6), (6, 7), (5, 7), (20, 21), (7, 20)]
    got = _cc(spark, edges)
    assert got == {(5, 5), (6, 5), (7, 5), (20, 5), (21, 5)}
    # reversed pair orientation must give identical labels
    assert got == _cc(spark, [(b, a) for a, b in edges])


def test_nonconvergence_raises(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(1, 9)], ["a_id", "b_id"])
    with pytest.raises(RuntimeError):
        connected_components(pairs, max_iters=1)


def test_dedup_keep_representative(spark):
    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(1, 7)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], ["a_id", "b_id"])
    kept = {r["doc_id"] for r in dedup_keep_representative(docs, pairs).collect()}
    assert kept == {1, 4, 5}
