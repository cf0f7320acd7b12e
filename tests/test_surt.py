"""SURT key transform (functions/urls.py::surt_key): rule-by-rule
known values, variant collapse, and the codegen'd (no-Python,
no-shuffle) expression shape."""

import pyspark.sql.functions as F

from google_vision_ocr_spark.functions.urls import surt_key


def _surt(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(surt_key(F.col("url"))).collect()]


def test_known_values(spark):
    got = _surt(
        spark,
        [
            "HTTPS://WWW.News.Example.ORG:443/Docs/5?b=2&a=1#frag",
            "https://news.example.org/Docs/5?a=1&utm_source=x&b=2",
            "http://example.com:8080/x",
            "https://example.com/",
            "http://one.two.three.example.co/p?z=1",
        ],
    )
    assert got[0] == "org,example,news)/Docs/5?a=1&b=2"
    assert got[1] == got[0]  # variant collapse
    assert got[2] == "com,example:8080)/x"  # non-default port kept
    assert got[3] == "com,example)/"
    assert got[4] == "co,example,three,two,one)/p?z=1"


def test_query_param_sort_and_cleanup(spark):
    got = _surt(
        spark,
        [
            "https://a.b/p?c=3&a=1&b=2",
            "https://a.b/p?b=2&gclid=zz&a=1&c=3",
            "https://a.b/p?utm_campaign=x",  # all params tracked away
        ],
    )
    assert got[0] == "b,a)/p?a=1&b=2&c=3"
    assert got[1] == got[0]
    assert got[2] == "b,a)/p"


def test_host_prefix_sorts_domains_together(spark):
    # the scale rationale: one registrable domain = one contiguous range
    keys = sorted(
        _surt(
            spark,
            [
                "https://mail.example.org/a",
                "https://example.org/b",
                "https://www.example.org/c",
                "https://other.net/d",
            ],
        )
    )
    ex = [k for k in keys if k.startswith("org,example")]
    assert len(ex) == 3
    assert keys.index(ex[-1]) - keys.index(ex[0]) == 2  # contiguous


def test_surt_is_scan_side_only(spark):
    df = spark.createDataFrame([("https://a.b/c",)], "url string")
    plan = df.select(surt_key(F.col("url")))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
