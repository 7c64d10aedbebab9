"""Host-graph PageRank for crawl prioritization — exact-integer iteration.

A production frontier schedules hosts, not just URLs: link-graph authority
(PageRank over the host→host graph) is the standard priority signal feeding
a scheduler like :mod:`pqueue` (the reference crawls seed hosts in fixed
order, src/spider.rs:36-223 — authority ranking is the north rule's scale
extension, so its semantics are pinned by the DuckDB oracle).

Why integer micro-units instead of doubles: a distributed PageRank sums
contributions in partition-dependent order, and float addition is not
associative — the same graph yields last-digit-different ranks run to run,
which breaks both the driver's value-hash gate and reproducible crawl
priorities (the repo's ``lm_score`` micro-nat lesson, NOTES.md round-5).
Here every rank is a BIGINT in units of 1/SCALE: shares are integer
divisions, sums are exact and order-independent, and the whole iteration
is a pure function of the edge set on any partitioning or cluster size.

Per-iteration update (all BIGINT, everything non-negative so div = floor):

    share(u)   = rank(u) div outdeg(u)            -- per out-edge
    inc(v)     = sum over edges u->v of share(u)
    dang       = sum of rank(u) over outdeg-less u -- dangling mass
    rank'(v)   = (DN·(SCALE div N)) div DD + (DM·(inc(v) + dang div N)) div DD

with damping DM/DD = 85/100, DN = DD−DM. Mass leaks a few units per node
per round to the floors — deterministic, identical in the oracle, and
irrelevant to the ordering the scheduler consumes.

Scale shape: one shuffle per round — ranks (host-level, ≪ edges) join
edges on src, then a sum keyed on dst; the dangling scalar rides an
in-plan 1-row cross join (no driver collect inside the loop). Lineage is
truncated per round with ``localCheckpoint`` (the :mod:`cluster` lesson:
persists keep the full plan and Catalyst time doubles per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # rank units per 1.0 of probability mass
DAMP_NUM = 85
DAMP_DEN = 100


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    scale: int = SCALE,
    damp_num: int = DAMP_NUM,
    damp_den: int = DAMP_DEN,
) -> DataFrame:
    """(host, rank_u) after ``iters`` exact-integer PageRank rounds.

    ``edges`` must be distinct (src, dst) pairs; duplicate edges would
    double-count shares. Self-loops are legitimate (a host linking to
    itself keeps some of its own mass).
    """
    # edges checkpoint ONCE up front (the hits() lesson): nodes, outdeg AND
    # every iteration's ranks⋈edges join re-read this table — without the
    # checkpoint the caller's upstream subtree (often a full fact-table
    # scan + distinct) re-executes once per consumer, iters+2 times total
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = (
        e.groupBy(F.col("src").alias("host"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    # one-time scalar: the node count parameterizes the uniform terms.
    # (One count() at build, never inside the loop — same budget as
    # cluster.connected_components' convergence probe.)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_u", F.lit(0).cast("long"))
    base = (damp_den - damp_num) * (scale // n) // damp_den

    ranks = nodes.withColumn("rank_u", F.lit(scale // n).cast("long"))
    # checkpoint every SECOND round: one round's lineage over k-row
    # tables is cheap to carry, and halving the eager materializations
    # halves the per-round job-scheduling latency (measured ~0.3-0.5 s
    # off a 5-round run; results bit-identical)
    for _i in range(iters):
        with_deg = ranks.join(outdeg, "host", "left")
        inc = (
            with_deg.filter(F.col("outdeg").isNotNull())
            .join(e, with_deg["host"] == e["src"])
            .groupBy(F.col("dst").alias("host"))
            .agg(F.sum(F.expr("rank_u div outdeg")).alias("inc"))
        )
        dang = (
            with_deg.filter(F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("rank_u"), F.lit(0)).alias("dang_total"))
        )
        ranks = (
            nodes.join(inc, "host", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "host",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damp_num} * (coalesce(inc, 0)"
                        f" + (dang_total div {n}))) div {damp_den}"
                    )
                ).cast("long").alias("rank_u"),
            )
        )
        if _i % 2 == 1 or _i == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank_cte(
    edges_cte: str,
    iters: int = 5,
    scale: int = SCALE,
    damp_num: int = DAMP_NUM,
    damp_den: int = DAMP_DEN,
) -> tuple[str, str]:
    """(with_body, final_relation) for the unrolled oracle — composable
    form so downstream oracles (crawl-budget apportionment) splice the
    identical recurrence instead of restating it."""
    damp_base = damp_den - damp_num
    parts = [
        f"edges AS ({edges_cte})",
        "nodes AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges)",
        "deg AS (SELECT src AS host, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        f"r0 AS (SELECT host, (SELECT {scale} // n FROM nn) AS rank_u FROM nodes)",
    ]
    for i in range(iters):
        prev, cur = f"r{i}", f"r{i + 1}"
        parts.append(
            f"""{cur} AS (
  WITH wd AS (SELECT p.host, p.rank_u, d.outdeg
              FROM {prev} p LEFT JOIN deg d USING (host)),
  inc AS (SELECT e.dst AS host, SUM(w.rank_u // w.outdeg) AS inc
          FROM wd w JOIN edges e ON w.host = e.src
          WHERE w.outdeg IS NOT NULL GROUP BY e.dst),
  dang AS (SELECT COALESCE(SUM(rank_u), 0) AS dang_total
           FROM wd WHERE outdeg IS NULL)
  SELECT n.host,
         ({damp_base} * ((SELECT {scale} // n FROM nn)) ) // {damp_den}
         + ({damp_num} * (COALESCE(i.inc, 0)
            + (SELECT dang_total FROM dang) // (SELECT n FROM nn)))
           // {damp_den} AS rank_u
  FROM nodes n LEFT JOIN inc i USING (host)
)"""
        )
    return ",\n".join(parts), f"r{iters}"


def pagerank_sql(
    edges_cte: str,
    iters: int = 5,
    scale: int = SCALE,
    damp_num: int = DAMP_NUM,
    damp_den: int = DAMP_DEN,
) -> str:
    """The DuckDB oracle for :func:`pagerank`, iterations unrolled.

    ``edges_cte`` is a SQL body producing DISTINCT (src, dst). Kept beside
    the operator so the integer recurrence can never drift between the
    engines (the registry splices it into the driver gate verbatim).
    """
    body, final = pagerank_cte(edges_cte, iters, scale, damp_num, damp_den)
    return f"WITH {body}\nSELECT host, rank_u FROM {final}"


# --------------------------------------------------------------------------
# HITS hubs/authorities — the second classic crawl-priority signal


HITS_SCALE = 1_000_000


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
    scale: int = HITS_SCALE,
) -> DataFrame:
    """(host, hub_u, auth_u) after ``iters`` exact-integer HITS rounds
    (Kleinberg, JACM 1999). PageRank scores where traffic LANDS; HITS
    separates directories/link-farms (hubs) from content hosts
    (authorities) — a crawler schedules hub hosts to DISCOVER and
    authority hosts to FETCH, so the pair is worth more than either alone.

    Same determinism discipline as :func:`pagerank`: every score is a
    BIGINT and every round normalizes by the exact integer MAX (order-
    independent, unlike an L2 norm whose float sum is partition-ordered):

        auth_raw(v) = Σ over edges u→v of hub(u)     -- exact long sum
        auth(v)     = auth_raw(v)·scale div max(auth_raw)
        hub_raw(u)  = Σ over edges u→v of auth(v)
        hub(u)      = hub_raw(u)·scale div max(hub_raw)

    Max-normalization keeps the fixed point's DIRECTION (any norm does);
    scores land in [0, scale] with the top hub/authority pegged at
    ``scale``. Overflow bound: raw·scale < 2^63 needs max in-degree <
    2^63/scale² ≈ 9.2M hosts at the default — lower ``scale`` for denser
    host graphs. Empty-side rounds normalize by GREATEST(max, 1).

    Plan per round: two rank⋈edges shuffles (one per direction), each max
    a 1-row broadcast cross join (no driver collect), ``localCheckpoint``
    once per FULL round to truncate lineage. ``edges`` must be distinct
    pairs.

    Sparse-iteration form (the round-5 session-11 14s→ fix): zero-score
    hosts contribute nothing to the next half-round's sum and cannot move
    a nonnegative max, so the per-half-round zero-fill join against the
    node dim is pure fixed overhead — iterations run on the SPARSE score
    tables (hosts with in-/out-degree ≥ 1) and the zero-fill happens ONCE
    at the end. Edges checkpoint once up front (the iteration body must
    never re-run the upstream distinct). Identical results — pinned by
    the unchanged DuckDB-oracle parity test, whose SQL still fills per
    half-round.
    """
    if iters < 1:
        raise ValueError("hits needs iters >= 1")
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    # hub scale only matters for hosts with outgoing edges; dst-only hosts
    # never contribute to an auth sum, so the sparse init is equivalent
    hub = (
        e.select(F.col("src").alias("host"))
        .distinct()
        .withColumn("hub_u", F.lit(scale).cast("long"))
    )
    auth = None

    def _half(scores: DataFrame, score_col: str, edge_in: str, edge_out: str, out_col: str) -> DataFrame:
        raw = (
            scores.join(e, scores["host"] == e[edge_in])
            .groupBy(F.col(edge_out).alias("host"))
            .agg(F.sum(score_col).cast("long").alias("raw"))
        )
        mx = raw.agg(F.greatest(F.max("raw"), F.lit(1)).alias("mx"))
        return raw.crossJoin(F.broadcast(mx)).select(
            "host",
            F.expr(f"(raw * {scale}) div mx").cast("long").alias(out_col),
        )

    for _ in range(iters):
        auth = _half(hub, "hub_u", "src", "dst", "auth_u")
        hub = _half(auth, "auth_u", "dst", "src", "hub_u").localCheckpoint(
            eager=True
        )
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    return (
        nodes.join(hub, "host", "left")
        .join(auth, "host", "left")
        .select(
            "host",
            F.coalesce("hub_u", F.lit(0)).cast("long").alias("hub_u"),
            F.coalesce("auth_u", F.lit(0)).cast("long").alias("auth_u"),
        )
    )


def hits_sql(edges_cte: str, iters: int = 4, scale: int = HITS_SCALE) -> str:
    """DuckDB oracle for :func:`hits`, iterations unrolled — kept beside
    the operator (like :func:`pagerank_sql`) so the integer recurrence
    cannot drift between engines. ``//`` is floor division; all raws are
    non-negative so it matches Spark's ``div`` exactly.

    Plan-shape constraint: the per-round max rides an UNPARTITIONED window
    (``MAX(raw) OVER ()``), never a scalar subquery, so every round CTE is
    referenced exactly ONCE by its successor. DuckDB inlines CTEs, and a
    scalar ``(SELECT MAX(raw) FROM ar_i)`` would be a second reference —
    the inlined tree then grows 4^iters (two doublings per round) and the
    oracle takes minutes on a 1k-edge graph where the window form is
    instant. The one tolerated doubling is the final hub⋈authority join
    re-referencing ``a{iters}``."""
    parts = [
        f"edges AS ({edges_cte})",
        "nodes AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges)",
        f"h0 AS (SELECT host, CAST({scale} AS BIGINT) AS hub_u FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""a{i} AS (
  SELECT host, (raw * {scale}) // GREATEST(MAX(raw) OVER (), 1) AS auth_u
  FROM (
    SELECT n.host, COALESCE(s.raw, 0) AS raw FROM nodes n LEFT JOIN (
      SELECT e.dst AS host, SUM(h.hub_u) AS raw
      FROM h{i - 1} h JOIN edges e ON h.host = e.src GROUP BY e.dst
    ) s USING (host)
  )
)"""
        )
        parts.append(
            f"""h{i} AS (
  SELECT host, (raw * {scale}) // GREATEST(MAX(raw) OVER (), 1) AS hub_u
  FROM (
    SELECT n.host, COALESCE(s.raw, 0) AS raw FROM nodes n LEFT JOIN (
      SELECT e.src AS host, SUM(a.auth_u) AS raw
      FROM a{i} a JOIN edges e ON a.host = e.dst GROUP BY e.src
    ) s USING (host)
  )
)"""
        )
    body = ",\n".join(parts)
    return (
        f"WITH {body}\nSELECT h.host, h.hub_u, a.auth_u"
        f" FROM h{iters} h JOIN a{iters} a USING (host)"
    )


# --------------------------------------------------------------------------
# TrustRank — seed-personalized PageRank for spam/link-farm demotion


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "host",
    iters: int = 5,
    scale: int = SCALE,
    damp_num: int = DAMP_NUM,
    damp_den: int = DAMP_DEN,
) -> DataFrame:
    """(host, trust_u) after ``iters`` exact-integer TrustRank rounds
    (Gyöngyi/Garcia-Molina/Pedersen, VLDB 2004): PageRank whose teleport
    vector is uniform over a curated SEED set instead of all hosts, so
    trust flows only along paths FROM seeds — a link farm with no inlink
    from the trusted web scores exactly 0 (integer arithmetic makes that
    a hard zero, not an epsilon), which is the demotion signal a frontier
    scheduler subtracts from raw PageRank before allocating fetch budget.

    Same recurrence as :func:`pagerank` with the uniform terms re-aimed:

        trust'(v) = [v∈S]·DN·(scale div |S|) div DD
                  + DM·(inc(v) + [v∈S]·(dang div |S|)) div DD

    (teleport mass and dangling mass both return to the seeds). With
    seeds = ALL hosts this is exactly :func:`pagerank` — asserted
    bit-for-bit in tests, which pins the shared recurrence. ``seeds``
    rows not present in the graph are ignored; an empty intersection
    raises (an all-zero trust vector ranks nothing).

    Plan shape per round is pagerank's: one ranks⋈edges shuffle + one
    dst-keyed sum; the seed flag is a broadcast-size dim joined once at
    build; dangling mass rides a 1-row cross join; ``localCheckpoint``
    truncates lineage per round.
    """
    # edges checkpoint once up front — the iteration body must never
    # re-run the caller's upstream distinct (see pagerank)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    flagged = nodes.join(
        seeds.select(F.col(seed_col).alias("host"))
        .distinct()
        .withColumn("is_seed", F.lit(True)),
        "host",
        "left",
    ).localCheckpoint(eager=True)
    outdeg = (
        e.groupBy(F.col("src").alias("host"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    n_seeds = flagged.filter(F.col("is_seed")).count()
    if n_seeds == 0:
        raise ValueError("trustrank needs at least one seed present in the graph")
    base_seed = (damp_den - damp_num) * (scale // n_seeds) // damp_den

    is_seed = F.coalesce(F.col("is_seed"), F.lit(False))
    ranks = flagged.select(
        "host",
        "is_seed",
        F.when(is_seed, F.lit(scale // n_seeds)).otherwise(F.lit(0))
        .cast("long")
        .alias("trust_u"),
    )
    # 2-round checkpoint cadence — see pagerank
    for _i in range(iters):
        with_deg = ranks.join(outdeg, "host", "left")
        inc = (
            with_deg.filter(F.col("outdeg").isNotNull())
            .join(e, with_deg["host"] == e["src"])
            .groupBy(F.col("dst").alias("host"))
            .agg(F.sum(F.expr("trust_u div outdeg")).alias("inc"))
        )
        dang = with_deg.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("trust_u"), F.lit(0)).alias("dang_total")
        )
        ranks = (
            flagged.join(inc, "host", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "host",
                "is_seed",
                (
                    F.when(is_seed, F.lit(base_seed)).otherwise(F.lit(0))
                    + F.expr(
                        f"({damp_num} * (coalesce(inc, 0)"
                        f" + if(coalesce(is_seed, false),"
                        f" dang_total div {n_seeds}, 0))) div {damp_den}"
                    )
                ).cast("long").alias("trust_u"),
            )
        )
        if _i % 2 == 1 or _i == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("host", "trust_u")


def trustrank_cte(
    edges_cte: str,
    seeds_cte: str,
    iters: int = 5,
    scale: int = SCALE,
    damp_num: int = DAMP_NUM,
    damp_den: int = DAMP_DEN,
) -> tuple[str, str]:
    """(with_body, final_relation) for the unrolled TrustRank oracle —
    same composable form as :func:`pagerank_cte`. ``seeds_cte`` yields a
    ``host`` column; only seeds present in the graph count, matching the
    operator. Each round CTE references its predecessor a bounded number
    of times (the pagerank_cte budget — wd twice per round), never through
    scalar-subquery fan-out (the :func:`hits_sql` lesson)."""
    damp_base = damp_den - damp_num
    parts = [
        f"edges AS ({edges_cte})",
        "nodes AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges)",
        f"seeds AS (SELECT DISTINCT host FROM ({seeds_cte}) WHERE host IN (SELECT host FROM nodes))",
        "deg AS (SELECT src AS host, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        "sn AS (SELECT COUNT(*) AS s FROM seeds)",
        "flagged AS (SELECT n.host, s.host IS NOT NULL AS is_seed"
        " FROM nodes n LEFT JOIN seeds s USING (host))",
        f"t0 AS (SELECT host, is_seed, CASE WHEN is_seed THEN"
        f" (SELECT {scale} // s FROM sn) ELSE 0 END AS trust_u FROM flagged)",
    ]
    for i in range(iters):
        prev, cur = f"t{i}", f"t{i + 1}"
        parts.append(
            f"""{cur} AS (
  WITH wd AS (SELECT p.host, p.trust_u, d.outdeg
              FROM {prev} p LEFT JOIN deg d USING (host)),
  inc AS (SELECT e.dst AS host, SUM(w.trust_u // w.outdeg) AS inc
          FROM wd w JOIN edges e ON w.host = e.src
          WHERE w.outdeg IS NOT NULL GROUP BY e.dst),
  dang AS (SELECT COALESCE(SUM(trust_u), 0) AS dang_total
           FROM wd WHERE outdeg IS NULL)
  SELECT f.host, f.is_seed,
         CASE WHEN f.is_seed THEN
           ({damp_base} * ((SELECT {scale} // s FROM sn))) // {damp_den}
         ELSE 0 END
         + ({damp_num} * (COALESCE(i.inc, 0)
            + CASE WHEN f.is_seed THEN
                (SELECT dang_total FROM dang) // (SELECT s FROM sn)
              ELSE 0 END))
           // {damp_den} AS trust_u
  FROM flagged f LEFT JOIN inc i USING (host)
)"""
        )
    return ",\n".join(parts), f"t{iters}"


def trustrank_sql(
    edges_cte: str,
    seeds_cte: str,
    iters: int = 5,
    scale: int = SCALE,
    damp_num: int = DAMP_NUM,
    damp_den: int = DAMP_DEN,
) -> str:
    """DuckDB oracle for :func:`trustrank`, iterations unrolled."""
    body, final = trustrank_cte(
        edges_cte, seeds_cte, iters, scale, damp_num, damp_den
    )
    return f"WITH {body}\nSELECT host, trust_u FROM {final}"


# --------------------------------------------------------------------------
# OPIC — Adaptive On-line Page Importance Computation (Abiteboul, Preda &
# Cobena, WWW 2003): the cash/history importance estimate Nutch ships as its
# default crawl scoring. Each page holds CASH; when crawled it credits its
# HISTORY with that cash and hands equal shares down its out-links; the
# importance estimate at any instant is history + cash. Unlike PageRank it
# needs no full-graph iteration to converge on a schedule — the crawl
# itself drives the computation, which is exactly what a frontier wants.
#
# This is the batch-synchronous variant (every page "crawled" each
# superstep — the paper's convergence theorem is crawl-policy-independent,
# so the synchronous schedule is a legitimate policy and the only
# deterministic one for an oracle). Same exact-integer discipline as
# `pagerank` above: cash in BIGINT units of 1/OPIC_SCALE, shares are floor
# divisions (a few units leak per round — deterministic, identical in the
# oracle); dangling cash is redistributed evenly the same round, standing
# in for the paper's virtual page. One shuffle per superstep, lineage
# truncated with localCheckpoint.


OPIC_SCALE = 1_000_000_000_000


def opic(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
    scale: int = OPIC_SCALE,
) -> DataFrame:
    """(host, cash_u, hist_u, score_u) after ``iters`` synchronous OPIC
    supersteps; ``score_u = hist_u + cash_u`` is the importance estimate
    the scheduler ranks on (the paper's H+C, unnormalized — ordering is
    what the frontier consumes). ``edges`` must be distinct (src, dst)."""
    # edges checkpoint once up front — the iteration body must never
    # re-run the caller's upstream distinct (see pagerank)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = (
        e.groupBy(F.col("src").alias("host"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "host",
            F.lit(0).cast("long").alias("cash_u"),
            F.lit(0).cast("long").alias("hist_u"),
            F.lit(0).cast("long").alias("score_u"),
        )
    state = nodes.select(
        "host",
        F.lit(scale // n).cast("long").alias("cash_u"),
        F.lit(0).cast("long").alias("hist_u"),
    )
    # 2-round checkpoint cadence — see pagerank
    for _i in range(iters):
        wd = state.join(outdeg, "host", "left")
        inc = (
            wd.filter(F.col("outdeg").isNotNull())
            .join(e, wd["host"] == e["src"])
            .groupBy(F.col("dst").alias("host"))
            .agg(F.sum(F.expr("cash_u div outdeg")).alias("inc"))
        )
        dang = wd.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("cash_u"), F.lit(0)).alias("dang_total")
        )
        state = (
            state.select(
                "host", (F.col("hist_u") + F.col("cash_u")).alias("hist_u")
            )
            .join(inc, "host", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "host",
                (
                    F.coalesce(F.col("inc"), F.lit(0))
                    + F.expr(f"dang_total div {n}")
                )
                .cast("long")
                .alias("cash_u"),
                "hist_u",
            )
        )
        if _i % 2 == 1 or _i == iters - 1:
            state = state.localCheckpoint(eager=True)
    return state.select(
        "host",
        "cash_u",
        "hist_u",
        (F.col("cash_u") + F.col("hist_u")).cast("long").alias("score_u"),
    )


def opic_cte(
    edges_cte: str, iters: int = 4, scale: int = OPIC_SCALE
) -> tuple[str, str]:
    """(with_body, final_relation) for the unrolled oracle — same
    composable shape as :func:`pagerank_cte`."""
    parts = [
        f"edges AS ({edges_cte})",
        "nodes AS (SELECT src AS host FROM edges UNION SELECT dst FROM edges)",
        "deg AS (SELECT src AS host, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        f"s0 AS (SELECT host, (SELECT {scale} // n FROM nn) AS cash_u,"
        " CAST(0 AS BIGINT) AS hist_u FROM nodes)",
    ]
    for i in range(iters):
        prev, cur = f"s{i}", f"s{i + 1}"
        parts.append(
            f"""{cur} AS (
  WITH wd AS (SELECT p.host, p.cash_u, d.outdeg
              FROM {prev} p LEFT JOIN deg d USING (host)),
  inc AS (SELECT e.dst AS host, SUM(w.cash_u // w.outdeg) AS inc
          FROM wd w JOIN edges e ON w.host = e.src
          WHERE w.outdeg IS NOT NULL GROUP BY e.dst),
  dang AS (SELECT COALESCE(SUM(cash_u), 0) AS dang_total
           FROM wd WHERE outdeg IS NULL)
  SELECT p.host,
         COALESCE(i.inc, 0)
           + (SELECT dang_total FROM dang) // (SELECT n FROM nn) AS cash_u,
         p.hist_u + p.cash_u AS hist_u
  FROM {prev} p LEFT JOIN inc i USING (host)
)"""
        )
    return ",\n".join(parts), f"s{iters}"


def opic_sql(edges_cte: str, iters: int = 4, scale: int = OPIC_SCALE) -> str:
    """DuckDB oracle for :func:`opic`, supersteps unrolled — kept beside
    the operator so the recurrence cannot drift between engines."""
    body, final = opic_cte(edges_cte, iters, scale)
    return (
        f"WITH {body}\nSELECT host, cash_u, hist_u,"
        f" cash_u + hist_u AS score_u FROM {final}"
    )


# --------------------------------------------------------------------------
# BFS hop distance from the seed set — the crawl-depth priority signal


def hop_distance(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 6,
) -> DataFrame:
    """(host, hops): exact BFS distance from the nearest seed, for every
    host reachable within ``max_hops`` link hops.

    Crawl depth is the oldest frontier-priority signal there is — a
    breadth-first crawl order (seeds first, their links next, ...) is what
    the reference's fixed seed-list loop degenerates to on a one-level
    graph (src/spider.rs:36-223), and depth caps are how real crawlers
    bound trap descent (:mod:`traps` flags per-URL path depth; THIS is the
    graph-global analogue). The output joins :mod:`pqueue` as a priority
    column (lower hops = crawl sooner) exactly like ``pagerank``/``opic``.

    Semantics: after k rounds every host whose true seed distance is ≤ k
    carries that exact distance, and no other host appears — a host only
    enters via a path of length ≤ k, and any such path bounds its true
    distance. So a fixed ``max_hops`` unroll is EXACT on the ≤ max_hops
    ball and silent beyond it (absence = "further than max_hops or
    unreachable"), deterministic on any partitioning: the per-round
    combine is an integer MIN, and seeds not present in the edge set are
    legitimately reported at hops 0.

    Scale shape: per round ONE join of the current distance table (host-
    level, ≪ edges) against edges on src plus ONE min-aggregate keyed on
    dst — both map-side combinable; ``localCheckpoint`` truncates lineage
    per round (the :mod:`cluster` lesson). The frontier table never holds
    more than one row per host.
    """
    # edges checkpoint once up front — the BFS body re-reads e every
    # round and must never re-run the caller's upstream subtree
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    dist = (
        seeds.select(F.col(seeds.columns[0]).alias("host"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    # 2-round checkpoint cadence — see pagerank
    for _i in range(max_hops):
        step = dist.join(e, dist["host"] == e["src"]).select(
            F.col("dst").alias("host"), (F.col("hops") + F.lit(1)).alias("hops")
        )
        dist = (
            dist.unionByName(step)
            .groupBy("host")
            .agg(F.min("hops").cast("long").alias("hops"))
        )
        if _i % 2 == 1 or _i == max_hops - 1:
            dist = dist.localCheckpoint(eager=True)
    return dist


def hop_distance_cte(
    edges_cte: str, seeds_cte: str, max_hops: int = 6, prefix: str = ""
) -> tuple[str, str]:
    """(with_body, final_relation) for the unrolled BFS oracle —
    composable like :func:`pagerank_cte` so schedulers splicing hops as a
    priority reuse the identical recurrence. ``prefix`` namespaces the
    internal CTEs so the body can sit in one WITH beside another
    generator's (both generators name an ``edges`` CTE otherwise)."""
    p = prefix
    parts = [
        f"{p}edges AS ({edges_cte})",
        f"{p}seeds AS ({seeds_cte})",
        f"{p}d0 AS (SELECT DISTINCT host, CAST(0 AS BIGINT) AS hops"
        f" FROM {p}seeds)",
    ]
    for i in range(max_hops):
        prev, cur = f"{p}d{i}", f"{p}d{i + 1}"
        parts.append(
            f"""{cur} AS (
  SELECT host, CAST(MIN(hops) AS BIGINT) AS hops FROM (
    SELECT host, hops FROM {prev}
    UNION ALL
    SELECT e.dst AS host, d.hops + 1 AS hops
    FROM {prev} d JOIN {p}edges e ON d.host = e.src
  ) GROUP BY host
)"""
        )
    return ",\n".join(parts), f"{p}d{max_hops}"


def hop_distance_sql(edges_cte: str, seeds_cte: str, max_hops: int = 6) -> str:
    """DuckDB oracle for :func:`hop_distance`, rounds unrolled — the
    recurrence lives in ONE generator for both engines."""
    body, final = hop_distance_cte(edges_cte, seeds_cte, max_hops)
    return f"WITH {body}\nSELECT host, hops FROM {final}"


def crawl_priority(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    pr_iters: int = 5,
    max_hops: int = 4,
    scale: int = SCALE,
) -> DataFrame:
    """(host, rank_u, hops, priority_u): the composed scheduler signal —
    authority discounted by seed distance, ``priority_u = rank_u div
    (1 + hops)``, with beyond-the-ball hosts (hops NULL) discounted at
    ``max_hops + 1``. This is the composition a frontier actually ranks
    on (a high-authority host 6 hops out should not outrank a decent host
    adjacent to a seed — BFS locality is the crawl-order prior, authority
    the tiebreaker), and it gates that :func:`pagerank_cte` and
    :func:`hop_distance_cte` COMPOSE in one plan/oracle the way
    ``revisit_plan`` gates the recrawl composition.

    Domain = the link graph's host set (PageRank's node set); seeds with
    no edges are not crawl targets and don't appear. All-integer
    discount, so the composed priority inherits both inputs' bit-exact
    partitioning independence. Plan: the two iterative results join once
    on host — host-level tables, broadcast-friendly at any corpus size.
    """
    pr = pagerank(edges, src=src, dst=dst, iters=pr_iters, scale=scale)
    hd = hop_distance(edges, seeds, src=src, dst=dst, max_hops=max_hops)
    return (
        pr.join(hd, "host", "left")
        .select(
            "host",
            "rank_u",
            "hops",
            F.expr(f"rank_u div (1 + coalesce(hops, {max_hops + 1}))")
            .cast("long")
            .alias("priority_u"),
        )
    )


def crawl_priority_sql(
    edges_cte: str,
    seeds_cte: str,
    pr_iters: int = 5,
    max_hops: int = 4,
    scale: int = SCALE,
) -> str:
    """DuckDB oracle for :func:`crawl_priority` — splices BOTH unrolled
    generators into one WITH (the BFS CTEs namespaced ``b_``), so the
    composition is gated end-to-end, not just the parts."""
    pr_body, pr_final = pagerank_cte(edges_cte, iters=pr_iters, scale=scale)
    hd_body, hd_final = hop_distance_cte(
        edges_cte, seeds_cte, max_hops=max_hops, prefix="b_"
    )
    return f"""WITH {pr_body},
{hd_body}
SELECT p.host, p.rank_u, h.hops,
       p.rank_u // (1 + COALESCE(h.hops, {max_hops + 1})) AS priority_u
FROM {pr_final} p LEFT JOIN {hd_final} h USING (host)"""
