"""Page directives (operators/directives.py): token-match robots
flags, canonical SURT, relative-canonical rejection, scan-side plan."""

from google_vision_ocr_spark.operators.directives import page_directives


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, html string")
    return {r["doc_id"]: r for r in page_directives(df).collect()}


def test_robots_token_match(spark):
    got = _run(
        spark,
        [
            (1, '<head><meta name="robots" content="noindex"></head>'),
            (2, '<head><meta name="robots" content="noindex, nofollow"></head>'),
            (3, '<head><meta name="robots" content="noindexfoo"></head>'),  # decoy
            (4, '<head><meta name="robots" content="NOFOLLOW"></head>'),    # case
            (5, "<head></head>"),                                            # none
        ],
    )
    assert (got[1]["noindex"], got[1]["nofollow"]) == (1, 0)
    assert (got[2]["noindex"], got[2]["nofollow"]) == (1, 1)
    assert (got[3]["noindex"], got[3]["nofollow"]) == (0, 0)
    assert (got[4]["noindex"], got[4]["nofollow"]) == (0, 1)
    assert (got[5]["noindex"], got[5]["nofollow"]) == (0, 0)


def test_canonical_surt_and_relative_rejection(spark):
    got = _run(
        spark,
        [
            (1, '<link rel="canonical" href="HTTPS://WWW.T.Example.COM:443/p?b=2&a=1">'),
            (2, '<link rel="canonical" href="/self">'),
            (3, "<head></head>"),
        ],
    )
    assert got[1]["canonical_surt"] == "com,example,t)/p?a=1&b=2"
    assert got[2]["canonical_surt"] == ""
    assert got[3]["canonical_surt"] == ""


def test_scan_side_plan(spark):
    df = spark.createDataFrame([(1, "<head></head>")], "doc_id int, html string")
    plan = page_directives(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
