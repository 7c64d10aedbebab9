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
