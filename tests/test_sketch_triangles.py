"""Count-min sketch and triangle-counting operator contracts."""

from pyspark.sql import functions as F

from google_vision_ocr_spark.operators.components import triangle_counts
from google_vision_ocr_spark.operators.sketch import (
    count_min_build,
    count_min_estimate,
)


def _words(spark, items):
    return spark.createDataFrame([(w,) for w in items], ["word"])


def test_cms_never_underestimates(spark):
    corpus = ["a"] * 40 + ["b"] * 7 + ["c"] * 1 + ["d"] * 13
    df = _words(spark, corpus)
    sk = count_min_build(df, "word", depth=4, width=64)
    keys = _words(spark, ["a", "b", "c", "d"])
    est = {
        r["word"]: r["cms_est"]
        for r in count_min_estimate(sk, keys, "word", depth=4, width=64).collect()
    }
    truth = {"a": 40, "b": 7, "c": 1, "d": 13}
    for w, t in truth.items():
        assert est[w] >= t, (w, est[w], t)
    # with 4 distinct keys in 4x64 counters, collisions are absent and
    # the estimates are exact
    assert est == truth


def test_cms_unknown_key_estimates_zero_or_collision(spark):
    df = _words(spark, ["a"] * 5)
    sk = count_min_build(df, "word", depth=4, width=64)
    est = count_min_estimate(
        sk, _words(spark, ["zzz"]), "word", depth=4, width=64
    ).collect()[0]
    assert 0 <= est["cms_est"] <= 5


def test_cms_sketches_merge_by_addition(spark):
    """sketch(A) + sketch(B) == sketch(A ∪ B) counter-for-counter —
    the mergeability that lets per-segment sketches roll up."""
    a = _words(spark, ["x"] * 3 + ["y"] * 2)
    b = _words(spark, ["y"] * 4 + ["z"] * 1)
    both = a.unionByName(b)
    merged = (
        count_min_build(a, "word", depth=4, width=32)
        .unionByName(count_min_build(b, "word", depth=4, width=32))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    direct = count_min_build(both, "word", depth=4, width=32)
    m = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    d = {(r["row"], r["bucket"]): r["cnt"] for r in direct.collect()}
    assert m == d


def test_triangles_known_graph(spark):
    # K4 minus one edge: nodes 1-4, edges of K4 except (3,4):
    # triangles (1,2,3) and (1,2,4) — nodes 1,2 in two, 3,4 in one
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], ["src", "dst"]
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangles_direction_and_duplicates_ignored(spark):
    edges = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 1), (2, 3), (3, 2), (5, 5)], ["src", "dst"]
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangles_no_triangle_graph_is_empty(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    assert triangle_counts(edges).count() == 0


def test_linear_counting_estimate_tracks_true_distinct(spark):
    from google_vision_ocr_spark.operators.sketch import (
        distinct_linear_counting,
    )

    df = _words(spark, [f"w{i % 200}" for i in range(5000)])
    row = distinct_linear_counting(df, "word", m=4096).collect()[0]
    # load factor 200/4096 ≈ 5%: the estimate sits within a few
    # percent of truth, and occupied <= true distinct
    assert row["occupied"] <= 200
    est = row["estimate_e4"] / 1e4
    assert 180 <= est <= 220, est


def test_cms_merge_equals_full_build(spark):
    from google_vision_ocr_spark.operators.sketch import (
        count_min_build,
        count_min_merge,
    )

    a = _words(spark, ["x"] * 3 + ["y"] * 2)
    b = _words(spark, ["y"] * 4 + ["z"] * 1)
    merged = count_min_merge(
        [count_min_build(a, "word"), count_min_build(b, "word")]
    )
    full = count_min_build(a.unionByName(b), "word")
    m = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    f = {(r["row"], r["bucket"]): r["cnt"] for r in full.collect()}
    assert m == f


def test_merge_of_empty_sketch_list_raises():
    import pytest as _pytest

    from google_vision_ocr_spark.operators.sketch import (
        count_min_merge,
        quantile_sketch_merge,
    )

    with _pytest.raises(ValueError):
        count_min_merge([])
    with _pytest.raises(ValueError):
        quantile_sketch_merge([])


def test_quantile_sketch_merge_equals_full_build(spark):
    from google_vision_ocr_spark.operators.sketch import (
        quantile_sketch_build,
        quantile_sketch_merge,
        quantile_sketch_quantiles,
    )

    rows = [(i, "a" if i % 3 else "b", float(i) * 1.37 - 40.0)
            for i in range(1, 61)]
    df = spark.createDataFrame(rows, "event_id bigint, k string, value double")
    a = df.filter("event_id % 2 = 0")
    b = df.filter("event_id % 2 = 1")
    merged = quantile_sketch_merge([
        quantile_sketch_build(a, "value", "k"),
        quantile_sketch_build(b, "value", "k"),
    ])
    full = quantile_sketch_build(df, "value", "k")
    m = {(r["k"], r["bucket"]): r["cnt"] for r in merged.collect()}
    f = {(r["k"], r["bucket"]): r["cnt"] for r in full.collect()}
    assert m == f
    got = {
        r["k"]: r
        for r in quantile_sketch_quantiles(merged, "k").collect()
    }
    # estimates stay within one bucket (~3.1% relative / exact <32c)
    # of the true quantiles, and negatives round toward zero via -lo
    import numpy as np

    for k in ("a", "b"):
        vals = sorted(v for _, kk, v in rows if kk == k)
        n = len(vals)
        for p, col in ((50, "p50_est"), (95, "p95_est")):
            true = vals[(p * (n - 1)) // 100]
            est = got[k][col]
            assert abs(est - true) <= max(0.32, abs(true) * 0.035), (
                k, col, est, true)
        assert got[k]["n_events"] == n
