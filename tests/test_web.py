"""URL canonicalization unit cases (operators/web.py)."""

from pyspark.sql import functions as F

from aquacache_spark.operators.web import with_parsed_url


def _parse(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return with_parsed_url(df).collect()[0]


def test_scheme_www_port_and_tracking_params_stripped(spark):
    r = _parse(spark,
               "HTTPS://WWW.News.Example.COM:443/a/b?utm_source=x&z=1&a=2")
    assert r["host"] == "news.example.com"
    assert r["registered_domain"] == "example.com"
    assert r["path"] == "/a/b"
    assert r["query_norm"] == "a=2&z=1"  # sorted, tracking dropped
    assert r["url_norm"] == "news.example.com/a/b?a=2&z=1"
    assert r["is_https"]


def test_multi_part_public_suffix(spark):
    r = _parse(spark, "http://a.b.gov.uk/x")
    assert r["registered_domain"] == "b.gov.uk"
    r = _parse(spark, "http://gov.uk/")
    assert r["registered_domain"] == "gov.uk"


def test_bare_host_defaults(spark):
    r = _parse(spark, "http://example.org")
    assert r["path"] == "/"
    assert r["query_norm"] == ""
    assert r["url_norm"] == "example.org/"
    assert not r["is_https"]


def test_single_label_host(spark):
    r = _parse(spark, "http://localhost:80/admin")
    assert r["host"] == "localhost"
    assert r["registered_domain"] == "localhost"
