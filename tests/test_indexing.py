"""Inverted postings (operators/indexing.py): content, ordering, bounds."""

import pytest
from pyspark.sql import functions as F

from google_vision_ocr_spark.operators.indexing import inverted_postings


@pytest.fixture(scope="module")
def docs(spark):
    # "the" in every doc (stopword), "apple" in 2, "kiwi" in 1
    return spark.createDataFrame(
        [
            (10, "the apple apple pie"),
            (7, "the apple tart"),
            (3, "the kiwi"),
            (5, "the the the"),
        ],
        "doc_id bigint, text string",
    )


def test_postings_sorted_and_distinct(docs):
    out = {
        r.term: (r.df, r.postings)
        for r in inverted_postings(docs, min_df=1, max_df=3).collect()
    }
    # within-doc repeats ("apple apple") count once
    assert out["apple"] == (2, "7,10")
    assert out["kiwi"] == (1, "3")
    # df == 4 exceeds max_df: the stopword never materializes
    assert "the" not in out


def test_min_df_floor(docs):
    out = {r.term for r in inverted_postings(docs, min_df=2, max_df=10).collect()}
    assert "kiwi" not in out and "apple" in out


def test_bad_bounds_raise(docs):
    with pytest.raises(ValueError):
        inverted_postings(docs, min_df=5, max_df=2)


def test_df_matches_postings_length(docs):
    for r in inverted_postings(docs, min_df=1, max_df=10).collect():
        assert r.df == len(r.postings.split(","))


def test_stopword_filter_precedes_collect(docs):
    # the df pre-pass must gate the collect: the joined frame feeding the
    # final aggregation carries no term beyond max_df
    plan = inverted_postings(docs, min_df=1, max_df=3)._jdf.queryExecution().toString()
    assert "collect_list" in plan
    # two aggregations: the count pre-pass and the bounded collect
    assert plan.count("Aggregate") >= 2


def test_merge_equals_full_build(spark, docs):
    from google_vision_ocr_spark.operators.indexing import merge_postings

    full = {
        (r.term, r.df, r.postings)
        for r in inverted_postings(docs, min_df=1, max_df=10).collect()
    }
    a = inverted_postings(docs.filter(F.col("doc_id") < 6), min_df=1, max_df=10)
    b = inverted_postings(docs.filter(F.col("doc_id") >= 6), min_df=1, max_df=10)
    merged = {
        (r.term, r.df, r.postings) for r in merge_postings(a, b).collect()
    }
    assert merged == full


def test_merge_keeps_terms_unique_to_one_segment(spark, docs):
    from google_vision_ocr_spark.operators.indexing import merge_postings

    a = inverted_postings(docs.filter(F.col("doc_id") == 3), min_df=1, max_df=10)
    b = inverted_postings(docs.filter(F.col("doc_id") != 3), min_df=1, max_df=10)
    out = {r.term: (r.df, r.postings) for r in merge_postings(a, b).collect()}
    assert out["kiwi"] == (1, "3")          # only in segment a
    assert out["the"] == (4, "3,5,7,10")    # spans both, ids re-sorted
