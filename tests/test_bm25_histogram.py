"""Unit coverage for bm25_search and equi_depth_histogram."""

from google_vision_ocr_spark.operators.profile import equi_depth_histogram
from google_vision_ocr_spark.operators.tfidf import bm25_search


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bm25_ranks_matching_docs_and_counts_terms(spark):
    docs = _docs(
        spark,
        [
            (1, "spark engine spark engine filler words here"),
            (2, "spark only mention padding padding padding padding"),
            (3, "nothing relevant at all in this document text"),
        ],
    )
    out = {r.doc_id: r for r in bm25_search(docs, ["spark", "engine"], k=5).collect()}
    assert 3 not in out  # no query term -> no row
    assert out[1].n_matched == 2 and out[2].n_matched == 1
    assert out[1].rank == 1 and out[1].score > out[2].score > 0


def test_bm25_tf_saturation(spark):
    # doubling tf must increase the score sublinearly (k1 saturation)
    docs = _docs(
        spark,
        [
            (1, "hit " * 2 + "pad " * 6),
            (2, "hit " * 4 + "pad " * 4),
            (3, "pad pad pad pad pad pad pad pad"),
        ],
    )
    out = {r.doc_id: r for r in bm25_search(docs, ["hit"], k=5).collect()}
    assert out[2].score > out[1].score
    assert out[2].score < 2 * out[1].score


def test_histogram_uniform_values_even_bins(spark):
    df = spark.range(1000).selectExpr("CAST(id AS DOUBLE) / 10.0 AS value")
    rows = sorted(equi_depth_histogram(df, "value", bins=10).collect())
    assert [r.bin for r in rows] == list(range(10))
    assert all(r.n_rows == 100 for r in rows)
    # bins tile the domain in order without overlap
    for a, b in zip(rows, rows[1:]):
        assert a.hi_value < b.lo_value


def test_histogram_heavy_duplicate_stays_in_one_bin(spark):
    # 900 copies of one value + 100 distinct: the duplicate never splits
    df = spark.range(1000).selectExpr(
        "CASE WHEN id < 900 THEN 5.0 ELSE CAST(id AS DOUBLE) END AS value"
    )
    rows = equi_depth_histogram(df, "value", bins=10).collect()
    dup_bins = [r for r in rows if r.lo_value <= 5.0 <= r.hi_value]
    assert len(dup_bins) == 1
    assert dup_bins[0].n_rows >= 900
    assert sum(r.n_rows for r in rows) == 1000
