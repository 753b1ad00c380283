from __future__ import annotations

from pyspark.sql import functions as F

from spiders_for_all_spark.functions.urls import (
    canonicalize_url,
    canonicalize_url_py,
    url_host,
    with_url_columns,
)

CASES = [
    ("https://H1.Example.COM/path?b=2&a=1#frag", "https://h1.example.com/path?a=1&b=2"),
    ("http://host.com:80/x", "http://host.com/x"),
    ("https://host.com:443/x?z=1", "https://host.com/x?z=1"),
    ("https://host.com", "https://host.com/"),
    ("https://host.com/api/list?chain=0&page=1&size=2", "https://host.com/api/list?chain=0&page=1&size=2"),
    ("HTTPS://a.b/c?x=1&m=0&k=9", "https://a.b/c?k=9&m=0&x=1"),
]


def test_canonicalize_spark_matches_python_twin(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    want = [expected for _, expected in CASES]
    assert got == want
    assert [canonicalize_url_py(u) for u, _ in CASES] == want


def test_url_host_strips_port_and_lowercases(spark):
    df = spark.createDataFrame([("https://API.Host.com:443/x?q=1",)], "url string")
    assert df.select(url_host(F.col("url"))).collect()[0][0] == "api.host.com"


def test_with_url_columns_hash_is_stable_on_canonical_form(spark):
    # two spellings of the same URL must collide on url_hash (seen-set key)
    df = spark.createDataFrame(
        [("https://H.com/a?b=2&a=1#x",), ("https://h.com/a?a=1&b=2",)], "url string"
    )
    out = with_url_columns(df).select("url_hash").distinct().collect()
    assert len(out) == 1
