"""Redirect-chain resolution (operators/redirects.py) — pointer doubling.

Covers: exact final-target/hops on chains, convergence of branching trees
(many srcs into one terminal), cycle + rho detection with the 2^R-step
witness the oracle replays, keep-first functionalization, and the doubling
invariant itself (a 20-hop chain resolves in 5 rounds, NOT 20).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from starchart_spark.operators import redirects


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _rows(df):
    return {
        r["src"]: (r["final_url"], r["hops"], r["is_cycle"]) for r in df.collect()
    }


def _brute(pairs, cap):
    """Reference walk: follow the functional map up to cap steps."""
    nxt = dict(pairs)
    out = {}
    for s in nxt:
        ptr, hops = nxt[s], 1
        while ptr in nxt and hops < cap:
            ptr, hops = nxt[ptr], hops + 1
        out[s] = (ptr, hops, ptr in nxt)
    return out


def test_chain_and_branching_tree(spark):
    # a->b->c->d (terminal), plus x,y both joining at b
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "b"), ("y", "c")]
    got = _rows(redirects.resolve_redirects(_edges(spark, pairs), rounds=3))
    assert got == _brute(pairs, cap=8)
    assert got["a"] == ("d", 3, False)
    assert got["x"] == ("d", 3, False)


def test_cycle_rho_and_self_loop(spark):
    # pure 3-cycle, a tail (rho) into it, and a self-loop
    pairs = [
        ("c1", "c2"),
        ("c2", "c3"),
        ("c3", "c1"),
        ("t1", "t2"),
        ("t2", "c1"),
        ("s", "s"),
    ]
    rounds = 3
    got = _rows(redirects.resolve_redirects(_edges(spark, pairs), rounds=rounds))
    assert got == _brute(pairs, cap=2**rounds)
    # every row in/upstream of a cycle carries the 2^R-step witness
    for s in ("c1", "c2", "c3", "t1", "t2", "s"):
        assert got[s][2] is True
        assert got[s][1] == 2**rounds
    assert got["s"][0] == "s"
    # cycle witness is the node exactly 2^R steps away
    assert got["c1"][0] == ["c1", "c2", "c3"][(2**rounds) % 3]


def test_doubling_resolves_long_chain_in_log_rounds(spark):
    # 20-hop chain: resolves at rounds=5 (cap 32); rounds=4 (cap 16) leaves
    # the head unresolved with the exact 16-step witness — both behaviors
    # are the documented contract, and 5 joins vs 20 IS the operator.
    pairs = [(f"n{i}", f"n{i+1}") for i in range(20)]
    full = _rows(redirects.resolve_redirects(_edges(spark, pairs), rounds=5))
    assert full["n0"] == ("n20", 20, False)
    capped = _rows(redirects.resolve_redirects(_edges(spark, pairs), rounds=4))
    assert capped["n0"] == ("n16", 16, True)  # n16 still has an out-edge
    assert capped["n5"] == ("n20", 15, False)


def test_functional_edges_keep_first(spark):
    dup = _edges(spark, [("a", "z"), ("a", "b"), ("b", "c")])
    fn = redirects.functional_edges(dup)
    assert {(r["src"], r["dst"]) for r in fn.collect()} == {("a", "b"), ("b", "c")}
    got = _rows(redirects.resolve_redirects(fn, rounds=3))
    assert got["a"] == ("c", 2, False)


def test_hops_exact_when_jump_partner_already_resolved(spark):
    # chain of 6: at round 2 the mid rows resolve with TRUE hop counts
    # (2^i + exact remainder), not a power of two — the path-arithmetic
    # invariant from the module docstring.
    pairs = [(f"m{i}", f"m{i+1}") for i in range(6)]
    got = _rows(redirects.resolve_redirects(_edges(spark, pairs), rounds=3))
    assert got == _brute(pairs, cap=8)
    assert [got[f"m{i}"][1] for i in range(6)] == [6, 5, 4, 3, 2, 1]
