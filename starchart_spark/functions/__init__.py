from starchart_spark.functions.urls import (  # noqa: F401
    canonicalize_series,
    canonicalize_udf,
    host_bucket,
    hostname_series,
    hostname_udf,
    url_hash,
)
