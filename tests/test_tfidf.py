"""Unit coverage for tfidf_top_terms."""

from google_vision_ocr_spark.operators.tfidf import tfidf_top_terms


def test_rare_term_beats_ubiquitous_term(spark):
    # 'the' appears in every doc (idf = ln(1) = 0); 'zebra' only in doc 1
    docs = spark.createDataFrame(
        [
            (1, "the the the zebra apple"),
            (2, "the apple"),
            (3, "the banana"),
            (4, "the banana apple"),
        ],
        "doc_id bigint, text string",
    )
    out = tfidf_top_terms(docs, k=2).collect()
    d1 = sorted((r for r in out if r.doc_id == 1), key=lambda r: r.rank)
    assert d1[0].term == "zebra"  # df=1 -> idf=ln(4), beats tf=3 'the' (idf=0)
    assert d1[0].df == 1 and d1[0].tf == 1
    # 'the' has tfidf exactly 0.0 everywhere it appears
    the_rows = [r for r in out if r.term == "the"]
    assert all(r.tfidf == 0.0 for r in the_rows)


def test_tie_breaks_are_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa bb")], "doc_id bigint, text string"
    )
    out = sorted(tfidf_top_terms(docs, k=2).collect(), key=lambda r: (r.doc_id, r.rank))
    # identical (tf, df, score) for aa/bb -> alphabetical within each doc
    assert [r.term for r in out] == ["aa", "bb", "aa", "bb"]


def test_k_limits_rows_per_doc(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id bigint, text string"
    )
    assert tfidf_top_terms(docs, k=3).count() == 3
