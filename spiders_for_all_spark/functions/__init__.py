from spiders_for_all_spark.functions.urls import (  # noqa: F401
    canonicalize_url,
    url_hash,
    url_host,
    url_path,
)
