"""Link-graph extraction (operators/linkgraph.py): resolution rules,
SURT collapse of noisy targets, skip rules, edge aggregation, and the
single-shuffle plan shape."""

from google_vision_ocr_spark.operators.linkgraph import extract_link_graph


def _run(spark, html, src="s.example.org", base="https://s.example.org"):
    df = spark.createDataFrame(
        [(src, base, html)], "src_host string, base_url string, html string"
    )
    return {(r["src_host"], r["dst_surt"]): r for r in extract_link_graph(df).collect()}


def test_absolute_and_relative_resolution(spark):
    got = _run(
        spark,
        '<a href="https://T.Example.COM/p">ext</a>'
        '<a href="/in/1?b=2&a=1">int</a>',
    )
    assert ("s.example.org", "com,example,t)/p") in got
    assert ("s.example.org", "org,example,s)/in/1?a=1&b=2") in got


def test_noisy_variants_collapse_to_one_edge(spark):
    got = _run(
        spark,
        '<a href="HTTPS://WWW.T.Example.COM:443/p?b=2&a=1#x">v1</a>'
        '<a href="https://t.example.com/p?a=1&utm_source=z&b=2">v2</a>',
    )
    assert len(got) == 1
    edge = got[("s.example.org", "com,example,t)/p?a=1&b=2")]
    assert edge["n_links"] == 2
    assert edge["first_anchor"] == "v1"  # min over anchor text


def test_non_fetchable_hrefs_drop(spark):
    got = _run(
        spark,
        '<a href="#top">a</a><a href="mailto:x@y">b</a>'
        '<a href="javascript:void(0)">c</a><a href="../rel">d</a>'
        '<a href="//proto.relative/x">e</a>'
        '<a href="/ok">keep</a>',
    )
    assert len(got) == 1
    assert ("s.example.org", "org,example,s)/ok") in got


def test_anchor_markup_strips(spark):
    got = _run(spark, '<a href="/p"><b>bold</b>  text</a>')
    assert got[("s.example.org", "org,example,s)/p")]["first_anchor"] == "bold text"


def test_single_shuffle_plan(spark):
    df = spark.createDataFrame(
        [("s.example.org", "https://s.example.org", '<a href="/p">x</a>')],
        "src_host string, base_url string, html string",
    )
    plan = extract_link_graph(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # only the edge aggregation
    assert "EvalPython" not in plan
