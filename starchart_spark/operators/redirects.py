"""Redirect-chain resolution by pointer doubling — O(log L) shuffles.

A crawler's URL ledger accumulates redirect edges (3xx Location,
rel=canonical, HSTS http→https upgrades); scheduling and dedup must charge
every alias to the CHAIN'S final target, or the frontier re-fetches each
hop as a distinct resource. The reference follows redirects implicitly
inside its HTTP client one fetch at a time (src/spider.rs crawl loop —
reqwest's default redirect policy); at ledger scale resolution is a graph
problem over the stored edge set instead.

The naive plan walks one hop per round: L joins for chains of length L,
and every round shuffles the FULL frontier again. This module uses pointer
doubling (a.k.a. path halving, the classic PRAM list-ranking technique —
Wyllie 1979): each round self-joins the pointer table with itself, so the
resolved distance doubles and chains of length ≤ 2^R finish in R rounds —
32-hop chains in 5 shuffles, not 32.

Invariants (the unit tests pin these, the DuckDB recursive-CTE oracle
replays them exactly):

- ``ptr`` is always the node exactly ``hops`` steps from ``src`` along the
  (functional) edge map;
- a row whose ``ptr`` has no outgoing edge is RESOLVED: ``hops`` is the
  true chain length, and it never changes again (the left join misses);
- a row still unresolved after round i has ``hops = 2^i`` exactly (its
  jump partner was necessarily unresolved too), so after R rounds the
  unresolved set is precisely "in or upstream of a cycle, observed at
  2^R steps" — the same verdict a bounded recursive walk with cap = 2^R
  reaches, which is what makes the oracle exact even on cycle rows.

Scale shape: per round ONE shuffle join keyed on ptr (state joins itself;
both sides are |edges| rows of three narrow columns), no driver collects,
``localCheckpoint`` per round (the cluster.py lineage lesson — without it
Catalyst re-plans the doubled join tree every round). Mega-host fan-in is
safe: the join key is the single predecessor pointer, so hot DESTINATIONS
never concentrate — rows keyed on ptr distribute across all its distinct
upstream chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def functional_edges(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Keep-first (min dst) per src — pointer maps must be functional.

    A URL observed redirecting to two different targets (load-balanced
    A/B, flapping CDN) keeps the lexicographically-least target so the
    resolution is a pure deterministic function of the edge set. One
    map-side-combinable min aggregate, no window.
    """
    return (
        edges.groupBy(F.col(src).alias("src"))
        .agg(F.min(F.col(dst)).alias("dst"))
    )


def resolve_redirects(
    edges: DataFrame,
    rounds: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Resolve every src to its chain's final target in ``rounds`` joins.

    ``edges`` must be functional (one dst per src — see
    :func:`functional_edges`). Returns one row per src:

    - ``final_url``  — chain terminal for resolved rows; for rows in or
      upstream of a cycle, the node exactly 2^rounds steps away (a
      deterministic cycle witness, identical to the oracle's capped walk);
    - ``hops``       — exact chain length (resolved) or 2^rounds (cycle);
    - ``is_cycle``   — final_url still has an outgoing edge.

    Chains up to 2^rounds hops resolve exactly; real redirect chains are
    browser-capped at ~20 hops, so rounds=5 (cap 32) is conservative.
    """
    state = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("ptr"),
        F.lit(1).cast("long").alias("hops"),
    ).localCheckpoint(eager=False)
    for _ in range(rounds):
        # explicit aliases: both join sides descend from one checkpointed
        # plan and Spark 4's self-join disambiguation needs the qualifiers
        cur = state.alias("cur")
        jump = state.select(
            F.col("src").alias("j_src"),
            F.col("ptr").alias("j_ptr"),
            F.col("hops").alias("j_hops"),
        ).alias("jmp")
        state = (
            cur.join(jump, F.col("cur.ptr") == F.col("jmp.j_src"), "left")
            .select(
                F.col("cur.src").alias("src"),
                F.coalesce("jmp.j_ptr", "cur.ptr").alias("ptr"),
                (F.col("cur.hops") + F.coalesce(F.col("jmp.j_hops"), F.lit(0))).alias(
                    "hops"
                ),
            )
            .localCheckpoint(eager=False)
        )
    cur = state.alias("cur")
    srcs = state.select(F.col("src").alias("t_src")).alias("trm")
    return (
        cur.join(srcs, F.col("cur.ptr") == F.col("trm.t_src"), "left")
        .select(
            F.col("cur.src").alias("src"),
            F.col("cur.ptr").alias("final_url"),
            F.col("cur.hops").alias("hops"),
            F.col("trm.t_src").isNotNull().alias("is_cycle"),
        )
    )


def resolve_redirects_sql(edges_cte: str, rounds: int = 5) -> str:
    """DuckDB oracle: bounded recursive walk with cap = 2^rounds.

    The walk stops growing at a terminal (join misses) or at the cap;
    the deepest row per src is exactly the operator's (final_url, hops)
    — including on cycles, where both engines observe the node at
    precisely 2^rounds steps (see module invariants).
    """
    cap = 2**rounds
    return f"""
WITH RECURSIVE e AS ({edges_cte}),
walk(src, ptr, hops) AS (
  SELECT src, dst, 1 FROM e
  UNION ALL
  SELECT w.src, e.dst, w.hops + 1
  FROM walk w JOIN e ON e.src = w.ptr
  WHERE w.hops < {cap}
),
deepest AS (
  SELECT src, ptr, hops,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY hops DESC) AS rn
  FROM walk
)
SELECT d.src,
       d.ptr AS final_url,
       CAST(d.hops AS BIGINT) AS hops,
       EXISTS (SELECT 1 FROM e WHERE e.src = d.ptr) AS is_cycle
FROM deepest d
WHERE d.rn = 1
"""
