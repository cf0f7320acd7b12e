"""Unit coverage for exact fixed-point PageRank."""

import pytest

from google_vision_ocr_spark.operators.pagerank import SCALE, pagerank_fixed_point


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_two_cycle_is_stationary(spark):
    # a<->b: r0 = SCALE/2 is the exact fixed point of the integer update
    e = _edges(spark, [("a", "b"), ("b", "a")])
    out = {r.node: r.rank for r in pagerank_fixed_point(e, iterations=4).collect()}
    assert out == {"a": SCALE // 2, "b": SCALE // 2}


def test_star_hand_computed(spark):
    # a->c, b->c after one iteration: c = t + 85%*(r0(a)+r0(b)), a=b=t
    e = _edges(spark, [("a", "c"), ("b", "c")])
    out = {r.node: r.rank for r in pagerank_fixed_point(e, iterations=1).collect()}
    r0 = SCALE // 3
    t = (15 * SCALE) // 300
    assert out["a"] == t and out["b"] == t
    assert out["c"] == t + (85 * (2 * r0)) // 100


def test_mass_bounded_and_deterministic_across_partitioning(spark):
    pairs = [(f"h{i}", f"h{(i * 7 + 3) % 11}") for i in range(11) if i != (i * 7 + 3) % 11]
    e = _edges(spark, pairs)
    a = sorted(pagerank_fixed_point(e, iterations=3).collect())
    b = sorted(pagerank_fixed_point(e.repartition(7), iterations=3).collect())
    assert a == b
    total = sum(r.rank for r in a)
    # floor divisions only lose mass; nothing is created
    assert 0 < total <= SCALE


def test_deep_iterations_via_checkpoint_path(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    out = pagerank_fixed_point(e, iterations=7, checkpoint_every=3).collect()
    # symmetric 3-cycle: all equal, stationary at SCALE/3 modulo floor
    ranks = {r.rank for r in out}
    assert len(ranks) == 1


def test_invalid_damping_raises(spark):
    with pytest.raises(ValueError):
        pagerank_fixed_point(_edges(spark, [("a", "b")]), damping_pct=101)
