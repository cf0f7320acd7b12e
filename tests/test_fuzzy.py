"""Unit coverage for deletion-neighborhood fuzzy matching."""

import pytest

from google_vision_ocr_spark.operators.fuzzy import fuzzy_word_pairs


def _vocab(spark, words):
    return spark.createDataFrame([(w,) for w in words], "word string")


def test_recovers_all_three_edit_kinds(spark):
    # substitution, deletion, insertion — all distance 1 from 'spark'
    v = _vocab(spark, ["spark", "sparc", "spak", "sparky", "unrelated"])
    pairs = {(r.w1, r.w2) for r in fuzzy_word_pairs(v).collect()}
    assert ("spak", "spark") in pairs       # deletion
    assert ("sparc", "spark") in pairs      # substitution
    assert ("spark", "sparky") in pairs     # insertion
    assert not any("unrelated" in p for p in pairs)


def test_no_pairs_beyond_distance_one(spark):
    v = _vocab(spark, ["alpha", "alxxa", "beta"])  # alxxa is d=2 from alpha
    assert fuzzy_word_pairs(v).count() == 0


def test_pairs_are_distinct_and_ordered(spark):
    # duplicates in the input and multiple shared variants -> one pair
    v = _vocab(spark, ["cat", "cut", "cat", "cut"])
    rows = fuzzy_word_pairs(v).collect()
    assert len(rows) == 1
    assert (rows[0].w1, rows[0].w2) == ("cat", "cut")


def test_distance_two_not_supported(spark):
    with pytest.raises(ValueError):
        fuzzy_word_pairs(_vocab(spark, ["a"]), max_distance=2)
