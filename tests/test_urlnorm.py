"""URL normalization / registered-domain extraction unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from pond_spark.functions.urlnorm import normalize_url, registered_domain


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [r[0] for r in df.select(normalize_url(F.col("url"))).collect()]


def _dom(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    return [r[0] for r in df.select(registered_domain(F.col("v"))).collect()]


def test_normalize_case_port_fragment(spark):
    out = _norm(
        spark,
        [
            "HTTP://WWW.Example.COM:80/Path/A#frag",
            "https://example.com:443/",
            "https://example.com:8443/x",  # non-default port survives
            "http://example.com",  # empty path -> /
        ],
    )
    assert out == [
        "http://www.example.com/Path/A",  # path case preserved
        "https://example.com/",
        "https://example.com:8443/x",
        "http://example.com/",
    ]


def test_normalize_query_params(spark):
    out = _norm(
        spark,
        [
            "http://e.com/p?utm_source=x&b=2&a=1",
            "http://e.com/p?gclid=abc&fbclid=def",  # all tracking -> none
            "http://e.com/p?z=1&y=2&z=0",  # sorted, duplicates kept
        ],
    )
    assert out == [
        "http://e.com/p?a=1&b=2",
        "http://e.com/p",
        "http://e.com/p?y=2&z=0&z=1",
    ]


def test_registered_domain(spark):
    assert _dom(
        spark,
        [
            "www.news.example.co.uk",
            "sub.example.com",
            "example.com",
            "localhost",
            "10.1.2.3",
            "http://WWW.Example.COM:8080/x",  # full URL accepted
        ],
    ) == [
        "example.co.uk",
        "example.com",
        "example.com",
        "localhost",
        "10.1.2.3",
        "example.com",
    ]
