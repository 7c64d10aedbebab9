"""DUST-style URL-parameter relevance mining — learn the strip list.

"Different URLs, Similar Text" (Bar-Yossef, Keidar, Schonfeld — WWW 2007)
observed that most near-duplicate URLs differ by mechanical rewrite rules,
and that crawlers should LEARN those rules from the content they already
fetched instead of hard-coding them. :func:`functions.urls.deep_url_normalize`
ships a static tracking-param strip list (utm_*, fbclid, ...); this module
mines the per-host dynamic complement: a query parameter is
CONTENT-IRRELEVANT on a host when, across every group of fetched URLs that
are identical except for that parameter (different values OR absent), the
content fingerprints agree. Mined rules feed back into frontier
canonicalization — the highest-leverage dedup a crawler owns, because one
session-id parameter can multiply a site's URL space by 10^6.

Semantics (the DuckDB oracle replays them exactly):

- URLs must be in canonical sorted-query form (deep_url_normalize output) —
  then "u minus param p" is a pure string computation and presence-variants
  meet their group by string equality;
- for every (host, param p, residual) group — residual = the URL with all
  p=... pairs removed and the rest re-sorted — collect the fingerprints of
  the group's members PLUS the fingerprint of the residual URL itself when
  it was fetched (the absent-variant);
- p is irrelevant on the host iff NO group shows >1 distinct fingerprint
  and at least ``min_support`` groups carry real evidence (≥2 observations,
  so a parameter seen once per page can never self-promote).

Scale shape: one explode (≤ #params extra rows per URL), ONE hash aggregate
keyed on (host, param, residual) — high-cardinality key, no skew hazard —
plus one equi-join on the URL string for absent-variants, then a tiny
per-(host,param) roll-up. Everything is JVM built-ins (split / filter /
array_sort / array_join); no Python touches a row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2-safe, identical in Spark and DuckDB
_HOST_RE = "^[a-z][a-z0-9+.-]*://([^/?#]+)"


def _residual_expr(url: str = "url", pname: str = "pname") -> str:
    """Spark-SQL expr: ``url`` with every ``pname=...`` pair removed.

    base ? sorted(other params) — '?' dropped when nothing remains.
    """
    return f"""
      concat(
        split({url}, '[?]')[0],
        coalesce(nullif(concat('?', array_join(array_sort(
          filter(split(split({url}, '[?]')[1], '&'),
                 x -> x != '' AND split(x, '=')[0] != {pname})
        ), '&')), '?'), '')
      )"""


def param_relevance(
    obs: DataFrame,
    min_support: int = 2,
    url_col: str = "url",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Mine per-(host, param) relevance from fetched (url, fingerprint).

    Returns one row per (hostname, param) observed in a query string:
    ``n_groups`` residual groups, ``evidence_groups`` (≥2 observations),
    ``violating_groups`` (>1 distinct fingerprint), and ``irrelevant`` —
    true iff zero violations and evidence ≥ min_support. Input URLs must
    be canonical (sorted query, no fragments) — compose with
    ``deep_url_normalize`` upstream.
    """
    from starchart_spark.operators.text import ensure_min_partitions

    o = obs.select(F.col(url_col).alias("url"), F.col(fp_col).alias("fp"))
    # the explode + per-row residual-string construction is the expensive
    # stage; a single-file scan would run it on 1-2 tasks, so spread first
    # (guide §2.5 input skew — no-op when the scan already has splits)
    # distinct (url, fp) FIRST (narrow exchange), then one row per DISTINCT
    # pname per url from array_distinct — together these make member rows
    # distinct on (hostname, pname, url, fp) BY CONSTRUCTION, exactly the
    # oracle's SELECT DISTINCT granularity, so the group count below is a
    # plain count(*) instead of a two-phase count_distinct(url) that
    # re-shuffled every residual string a second time (guide §2.3).
    o_d = o.where(F.col("url").contains("?")).dropDuplicates(["url", "fp"])
    member = (
        ensure_min_partitions(o_d)
        .select(
            "url",
            "fp",
            F.regexp_extract("url", _HOST_RE, 1).alias("hostname"),
            F.explode(
                F.expr(
                    "array_distinct(transform("
                    "filter(split(split(url, '[?]')[1], '&'), x -> x != ''),"
                    " x -> split(x, '=')[0]))"
                )
            ).alias("pname"),
        )
        .where(F.col("pname") != "")
        .withColumn("residual", F.expr(_residual_expr()))
    )
    member_fp = member.groupBy("hostname", "pname", "residual", "fp").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    # absent-variant attach WITHOUT a keys-distinct branch or a union (each
    # re-ran pieces of the member subtree): LEFT-join the per-URL
    # fingerprint dim (min(fp) per URL mirrors the oracle exactly; in
    # practice fp is a pure function of the URL's content so the min is the
    # only value) and fold it into the group aggregate by set arithmetic —
    # member_fp rows are distinct on fp within a group, so
    #   ndf   = count(member fps) + 1 iff the absent fp exists and differs
    #           from every member fp,
    #   n_obs = Σ __cnt + 1 iff the absent fp exists
    # — exactly countDistinct/count over the old member ∪ absent union.
    urlfp = o.groupBy(F.col("url").alias("residual")).agg(F.min("fp").alias("__fp_a"))
    joined = member_fp.join(urlfp, "residual", "left")
    grouped = (
        joined.groupBy("hostname", "pname", "residual")
        .agg(
            F.count("fp").alias("__ndf_m"),
            F.sum("__cnt").alias("__n_obs_m"),
            F.max(F.col("__fp_a").isNotNull().cast("long")).alias("__has_a"),
            F.coalesce(
                F.max((F.col("fp") == F.col("__fp_a")).cast("long")), F.lit(0)
            ).alias("__a_in_m"),
        )
        .select(
            "hostname",
            "pname",
            "residual",
            (
                F.col("__ndf_m")
                + ((F.col("__has_a") == 1) & (F.col("__a_in_m") == 0)).cast("long")
            ).alias("ndf"),
            (F.col("__n_obs_m") + F.col("__has_a")).alias("n_obs"),
        )
    )
    return (
        grouped.groupBy("hostname", "pname")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum((F.col("n_obs") >= 2).cast("long")).alias("evidence_groups"),
            F.sum((F.col("ndf") > 1).cast("long")).alias("violating_groups"),
        )
        .select(
            "hostname",
            F.col("pname").alias("param"),
            "n_groups",
            "evidence_groups",
            "violating_groups",
            (
                (F.col("violating_groups") == 0)
                & (F.col("evidence_groups") >= F.lit(min_support))
            ).alias("irrelevant"),
        )
    )


def strip_mined_params(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Apply mined rules: remove each URL's irrelevant params (one pass).

    ``rules`` is :func:`param_relevance` output (or any
    (hostname, param, irrelevant) table). The rule dim is host×param —
    tiny next to the frontier — so it broadcasts; the frontier is touched
    by ONE explode + ONE hash aggregate reassembly, never shuffled on a
    skewed key (the aggregate key is the URL itself).
    """
    r = rules.where("irrelevant").select(
        "hostname", F.col("param").alias("pname")
    )
    parts = urls.select(
        F.col(url_col).alias("url"),
        F.regexp_extract(url_col, _HOST_RE, 1).alias("hostname"),
        # get() tolerates URLs without a query string (NULL, not an ANSI
        # index error)
        F.expr(
            f"filter(split(get(split({url_col}, '[?]'), 1), '&'), x -> x != '')"
        ).alias("pairs"),
    )
    flat = parts.select(
        "url", "hostname", F.posexplode_outer("pairs").alias("pos", "pair")
    ).withColumn("pname", F.expr("split(pair, '=')[0]"))
    kept = flat.join(F.broadcast(r), ["hostname", "pname"], "left_anti")
    return (
        kept.groupBy("url")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.when(F.col("pair").isNotNull(), F.col("pair")))
                ),
                "&",
            ).alias("q")
        )
        .select(
            "url",
            F.concat(
                F.expr("split(url, '[?]')[0]"),
                F.coalesce(
                    F.nullif(F.concat(F.lit("?"), F.col("q")), F.lit("?")), F.lit("")
                ),
            ).alias("stripped_url"),
        )
    )


def param_relevance_sql(obs_cte: str, min_support: int = 2) -> str:
    """DuckDB oracle for :func:`param_relevance` over an (url, fp) CTE."""
    residual = """
      string_split(url, '?')[1] ||
      coalesce(nullif('?' || array_to_string(list_sort(
        list_filter(string_split(string_split(url, '?')[2], '&'),
                    x -> x != '' AND string_split(x, '=')[1] != pname)
      ), '&'), '?'), '')"""
    return f"""
WITH obs AS ({obs_cte}),
member AS (
  SELECT DISTINCT
         regexp_extract(url, '{_HOST_RE}', 1) AS hostname,
         string_split(pair, '=')[1] AS pname,
         url, fp
  FROM (
    SELECT url, fp, unnest(string_split(string_split(url, '?')[2], '&')) AS pair
    FROM obs WHERE contains(url, '?')
  )
  WHERE pair != '' AND string_split(pair, '=')[1] != ''
),
member_r AS (
  SELECT hostname, pname, {residual} AS residual, fp FROM member
),
keys AS (SELECT DISTINCT hostname, pname, residual FROM member_r),
absent AS (
  SELECT k.hostname, k.pname, k.residual, v.fp
  FROM keys k
  JOIN (SELECT url AS residual, min(fp) AS fp FROM obs GROUP BY 1) v USING (residual)
),
grouped AS (
  SELECT hostname, pname, residual,
         COUNT(DISTINCT fp) AS ndf, COUNT(*) AS n_obs
  FROM (SELECT * FROM member_r UNION ALL SELECT * FROM absent)
  GROUP BY 1, 2, 3
)
SELECT hostname, pname AS param,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN n_obs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS evidence_groups,
       CAST(SUM(CASE WHEN ndf > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS violating_groups,
       (SUM(CASE WHEN ndf > 1 THEN 1 ELSE 0 END) = 0 AND
        SUM(CASE WHEN n_obs >= 2 THEN 1 ELSE 0 END) >= {min_support})
         AS irrelevant
FROM grouped GROUP BY 1, 2
"""
