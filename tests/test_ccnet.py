"""CCNet perplexity bucketing (operators/ccnet.py): tercile rule on a
known corpus, small-language edge rule, code monotonicity, and the
broadcast-cutoff plan shape."""

from pyspark.sql import functions as F

from google_vision_ocr_spark.operators.ccnet import _CCN_CODE, perplexity_buckets


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, lang string, text string")


def test_terciles_on_three_score_classes(spark):
    # 9 docs, one lang, three distinct score levels (common word "a"
    # scores lowest, all-singleton words highest)
    rows = (
        [(i, "x", "a a a a") for i in range(3)]
        + [(i, "x", "a b") for i in range(3, 6)]
        + [(i, "x", f"u{i} v{i} w{i} z{i}") for i in range(6, 9)]
    )
    out = {r["doc_id"]: r for r in perplexity_buckets(_mk(spark, rows)).collect()}
    assert [out[i]["bucket"] for i in range(9)] == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    # buckets follow the monotone code: head codes < middle < tail
    assert max(out[i]["qs_code"] for i in range(3)) < min(out[i]["qs_code"] for i in range(3, 6))
    assert max(out[i]["qs_code"] for i in range(3, 6)) < min(out[i]["qs_code"] for i in range(6, 9))


def test_tiny_language_edge_rule(spark):
    # n=1: k1=k2=0 -> no head/middle, the lone doc is tail.
    # n=2: k1=0, k2=1 -> lower-scoring doc is middle, other tail.
    rows = [
        (1, "solo", "a a a"),
        (2, "pair", "a a a a a a"),   # common corpus word -> lower score
        (3, "pair", "q r s t"),       # singletons -> higher score
    ]
    out = {r["doc_id"]: r for r in perplexity_buckets(_mk(spark, rows)).collect()}
    assert out[1]["bucket"] == "tail"
    assert out[2]["bucket"] == "middle"
    assert out[3]["bucket"] == "tail"


def test_identical_docs_share_bucket(spark):
    # ties collapse into one code cell -> one bucket for all copies
    rows = [(i, "x", "same text here") for i in range(6)]
    buckets = {r["bucket"] for r in perplexity_buckets(_mk(spark, rows)).collect()}
    assert buckets == {"head"}  # one cell holds everyone; cum >= k1 at it


def test_code_is_monotone():
    # python mirror of _CCN_CODE over a dense range + octave borders
    def code(c):
        if c == 0:
            return 0
        bl = c.bit_length()
        return bl * 4096 + (c >> max(bl - 12, 0))

    vals = list(range(0, 5000)) + [2**k + d for k in range(12, 63) for d in (-1, 0, 1)]
    codes = [code(v) for v in sorted(vals)]
    assert codes == sorted(codes)
    assert all(c <= 64 * 4096 + 4095 for c in codes)


def test_spark_code_matches_python_mirror(spark):
    def code(c):
        if c == 0:
            return 0
        bl = c.bit_length()
        return bl * 4096 + (c >> max(bl - 12, 0))

    vals = [0, 1, 7, 4095, 4096, 8191, 123456789, 2**52 + 12345]
    df = spark.createDataFrame([(v,) for v in vals], "c long")
    got = [r[0] for r in df.select(F.expr(_CCN_CODE.format(c="c"))).collect()]
    assert got == [code(v) for v in vals]


def test_cutoffs_travel_as_broadcast(spark):
    rows = [(i, "x", f"w{i % 4} y") for i in range(12)]
    df = perplexity_buckets(_mk(spark, rows))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # cutoff join never shuffles the corpus
