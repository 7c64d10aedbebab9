"""URL canonicalization — the D1 "canonicalize-then-hash" stage.

Reproduces the reference's ``clean_url`` (/root/reference/db/db-core/src/lib.rs:81-89):
strip path, query and fragment, keeping ``scheme://host[:port]/``. The Rust
``url`` crate additionally lowercases scheme+host and drops default ports, so
we match that normalization too (it is applied by ``Url::parse`` before
``clean_url`` ever runs, e.g. forge/gitea/src/lib.rs:44).

Implementation notes (scale):
- the canonicalizer is a *vectorized* pandas UDF built from pandas' C string
  ops (``str.extract`` / ``str.lower`` / boolean masks) — no per-element
  Python loop, per the input_hint mandate;
- the hash stage stays JVM-side: ``F.xxhash64`` inside whole-stage codegen.
  Hashing in Python would move 10^10 strings across Arrow for no reason.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# scheme :// [userinfo@] host [:port]  — remainder (path/query/fragment) dropped
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://(?:([^/?#@]*)@)?([^/?#:@]*)(?::(\d+))?"

_DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443", "ftp": "21"}


def canonicalize_series(urls: pd.Series) -> pd.Series:
    """Vectorized clean_url over a pandas Series of URL strings.

    Non-URL / unparseable inputs yield <NA> (they can never be frontier keys).
    """
    parts = urls.astype("string").str.extract(_URL_RE)
    scheme = parts[0].str.lower()
    userinfo = parts[1]
    host = parts[2].str.lower()
    port = parts[3]

    # drop default port for the scheme
    default_port = scheme.map(_DEFAULT_PORTS)
    port = port.mask(port == default_port)

    out = scheme + "://"
    out = out + (userinfo + "@").fillna("")
    out = out + host
    out = out + (":" + port).fillna("")
    out = out + "/"
    # a URL without scheme+host is not canonicalizable
    out = out.mask(scheme.isna() | host.isna() | (host == ""))
    return out


def hostname_series(urls: pd.Series) -> pd.Series:
    """Vectorized hostname extraction (reference ``get_hostname``,
    federate/federate-core/src/lib.rs:100-102)."""
    parts = urls.astype("string").str.extract(_URL_RE)
    return parts[2].str.lower().mask(parts[2].isna() | (parts[2] == ""))


@pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return canonicalize_series(urls)


@pandas_udf(T.StringType())
def hostname_udf(urls: pd.Series) -> pd.Series:
    return hostname_series(urls)


def canonicalize_via_dim(
    df, url_col: str, out_col: str = "canonical_host", broadcast_dim: bool = True
):
    """Canonicalize at O(distinct host prefixes) instead of O(URLs).

    ``clean_url`` depends only on the ``scheme://authority`` prefix, so the
    scale path extracts that prefix JVM-side (codegen'd regexp), runs the
    vectorized pandas canonicalizer over the *distinct* prefixes only (one
    row per host — 10^6-ish even at a 10^10-URL frontier), and joins the
    result back. The Arrow UDF still owns the canonicalization semantics;
    it just stops being invoked 10^4 times per host.
    """
    prefix = F.regexp_extract(
        F.col(url_col), r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1
    )
    with_prefix = df.withColumn("__prefix", prefix)
    dim = (
        with_prefix.select("__prefix")
        .distinct()
        .withColumn(out_col, canonicalize_udf(F.col("__prefix")))
    )
    if broadcast_dim:
        dim = F.broadcast(dim)
    return with_prefix.join(dim, "__prefix", "left").drop("__prefix")


def url_hash(col: Column | str) -> Column:
    """64-bit key hash, JVM-side (xxhash64 under whole-stage codegen)."""
    return F.xxhash64(F.col(col) if isinstance(col, str) else col)


def host_bucket(col: Column | str, num_buckets: int) -> Column:
    """Stable host→bucket assignment used for table layout, the partitioned
    bloom filters and politeness grouping. Mirrors Iceberg ``bucket(B, host)``
    hidden partitioning (same idea, not byte-identical hashing)."""
    return F.pmod(url_hash(col), F.lit(num_buckets)).cast("int")


# --------------------------------------------------------------------------
# Deep-URL normalization — frontier dedup keys for FULL urls (paths/queries)
#
# ``clean_url`` (above) is the reference's INSTANCE key: scheme://host/.
# Media refs, sitemap locs and deep page URLs need dedup at full-URL
# granularity, where the same resource hides behind dot-segments
# (/a/b/../c), duplicate slashes, case-varied hosts, default ports,
# tracking params and permuted query strings. This section is RFC 3986
# §6.2 syntax-based normalization plus the two crawl-standard extras
# (tracking-param strip, query-param sort), implemented ENTIRELY as
# codegen'd JVM expressions with RE2-compatible patterns (no lookaheads)
# so the DuckDB oracle can run character-identical rules.
#
# Documented bounds and exclusions:
# - dot-segment folding runs MAX_DOTDOT_PASSES bounded passes (nesting
#   deeper than that leaves a residual — same bounded-depth trade as
#   domains.MAX_LABELS); each pass folds '/seg/../' where seg != '..',
#   expressed without lookahead as (len-1 | len-2-not-'..' | len>=3);
# - userinfo and fragments drop (two URLs differing only there are one
#   fetch); percent-encoding is left byte-as-is (case-normalizing %XX
#   needs per-char logic that buys little on real frontiers).

MAX_DOTDOT_PASSES = 8

_DEEP_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?"
_DOTDOT = r"/(?:[^/]|[^/.][^/]|[^/][^/.]|[^/]{3,})/\.\./"
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref_src)(=|$)"


def deep_url_normalize(col: Column | str) -> Column:
    """RFC 3986 syntax-normalized full URL (JVM Column); NULL when the
    input has no scheme://host. Rules, in order: lowercase scheme+host,
    drop userinfo + fragment, drop the scheme's default port, path '' →
    '/', collapse duplicate slashes, resolve ./ and bounded ../, strip
    tracking params, sort surviving query params bytewise."""
    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(c, _DEEP_RE, 1))
    auth = F.lower(F.regexp_extract(c, _DEEP_RE, 2))
    # userinfo off, then default port off (host case already lowered)
    auth = F.regexp_replace(auth, r"^[^@]*@", "")
    default_port = F.when(scheme == "http", F.lit(":80")).when(
        scheme == "https", F.lit(":443")
    ).when(scheme == "ftp", F.lit(":21")).otherwise(F.lit(""))
    auth = F.when(
        (default_port != "") & auth.endswith(default_port),
        F.left(auth, F.length(auth) - F.length(default_port)),
    ).otherwise(auth)
    path = F.regexp_extract(c, _DEEP_RE, 3)
    query = F.regexp_extract(c, _DEEP_RE, 4)

    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.regexp_replace(path, "/{2,}", "/")
    # a trailing '/.' or '/..' acts like '/./' / '/../' per the RFC
    path = F.regexp_replace(path, r"(/\.\.?)$", r"$1/")
    for _ in range(2):
        path = F.regexp_replace(path, r"/\./", "/")
    for _ in range(MAX_DOTDOT_PASSES):
        path = F.regexp_replace(path, _DOTDOT, "/")
    # '../' at root has no parent: /../ collapses to /
    path = F.regexp_replace(path, r"^(/\.\.)+/", "/")

    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda x: (F.length(x) > 0) & ~x.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    out = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )
    return F.when((scheme != "") & (auth != ""), out)


def deep_url_normalize_sql(expr: str) -> str:
    """The identical program as one DuckDB SQL expression over ``expr``
    (a VARCHAR expression). Kept beside the Column so the two rule sets
    cannot drift — tests assert byte equality on adversarial vectors."""
    scheme = f"lower(regexp_extract({expr}, '{_DEEP_RE}', 1))"
    auth0 = f"regexp_replace(lower(regexp_extract({expr}, '{_DEEP_RE}', 2)), '^[^@]*@', '')"
    dport = (
        f"CASE {scheme} WHEN 'http' THEN ':80' WHEN 'https' THEN ':443' "
        "WHEN 'ftp' THEN ':21' ELSE '' END"
    )
    auth = (
        f"CASE WHEN {dport} != '' AND {auth0} LIKE '%' || {dport} "
        f"THEN left({auth0}, length({auth0}) - length({dport})) ELSE {auth0} END"
    )
    path = f"regexp_extract({expr}, '{_DEEP_RE}', 3)"
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    path = f"regexp_replace({path}, '/{{2,}}', '/', 'g')"
    path = f"regexp_replace({path}, '(/\\.\\.?)$', '\\1/', 'g')"
    for _ in range(2):
        path = f"regexp_replace({path}, '/\\./', '/', 'g')"
    for _ in range(MAX_DOTDOT_PASSES):
        path = f"regexp_replace({path}, '{_DOTDOT}', '/', 'g')"
    path = f"regexp_replace({path}, '^(/\\.\\.)+/', '/', 'g')"
    query = f"regexp_extract({expr}, '{_DEEP_RE}', 4)"
    kept = (
        f"array_to_string(list_sort(list_filter(string_split({query}, '&'), "
        f"x -> length(x) > 0 AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}'))), '&')"
    )
    return (
        f"CASE WHEN {scheme} != '' AND {auth} != '' THEN "
        f"{scheme} || '://' || {auth} || {path} || "
        f"CASE WHEN {kept} != '' THEN '?' || {kept} ELSE '' END END"
    )
