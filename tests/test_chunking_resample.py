"""Unit coverage for token_chunks (training-sequence windows) and
target_mix_resample (deterministic class rebalancing)."""

import pytest
from pyspark.sql import functions as F

from google_vision_ocr_spark.operators.chunking import token_chunks
from google_vision_ocr_spark.operators.sampling import target_mix_resample


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_short_doc_single_partial_chunk(spark):
    out = token_chunks(_docs(spark, [(1, "a b c")]), size=4, stride=4).collect()
    assert len(out) == 1
    assert out[0].chunk_id == 0
    assert out[0].chunk_text == "a b c"
    assert out[0].n_tokens == 3


def test_exact_multiple_non_overlapping(spark):
    text = " ".join(f"t{i}" for i in range(8))
    out = {
        r.chunk_id: r
        for r in token_chunks(_docs(spark, [(1, text)]), size=4, stride=4).collect()
    }
    assert set(out) == {0, 1}
    assert out[0].chunk_text == "t0 t1 t2 t3"
    assert out[1].chunk_text == "t4 t5 t6 t7"
    assert all(r.n_tokens == 4 for r in out.values())


def test_overlapping_stride(spark):
    text = " ".join(f"t{i}" for i in range(10))
    out = {
        r.chunk_id: r
        for r in token_chunks(_docs(spark, [(1, text)]), size=6, stride=4).collect()
    }
    # starts 0, 4, 8 — floor((10-1)/4) = 2
    assert set(out) == {0, 1, 2}
    assert out[0].chunk_text == "t0 t1 t2 t3 t4 t5"
    assert out[1].chunk_text == "t4 t5 t6 t7 t8 t9"
    assert out[2].chunk_text == "t8 t9"
    assert out[2].n_tokens == 2


def test_empty_and_whitespace_docs_produce_no_chunks(spark):
    out = token_chunks(
        _docs(spark, [(1, ""), (2, "   \n\t "), (3, "one")]), size=4
    ).collect()
    assert [r.doc_id for r in out] == [3]


def test_invalid_size_stride_raises(spark):
    d = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        token_chunks(d, size=0)
    with pytest.raises(ValueError):
        token_chunks(d, size=4, stride=-1)


def _classed(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(200)]
    return spark.createDataFrame(rows, "doc_id bigint, lang string")


def test_resample_rate_zero_drops_class_and_full_keeps(spark):
    d = _classed(spark)
    out = target_mix_resample(d, {"en": 0}, class_col="lang").collect()
    langs = {r.lang for r in out}
    assert langs == {"de"}
    assert len(out) == 100  # default 1e6 keeps every de row


def test_resample_is_deterministic_and_rate_shaped(spark):
    d = _classed(spark)
    a = sorted(r.doc_id for r in target_mix_resample(d, {"en": 500_000}).collect())
    b = sorted(r.doc_id for r in target_mix_resample(d, {"en": 500_000}).collect())
    assert a == b
    n_en = sum(1 for i in a if i % 2 == 0)
    assert 30 <= n_en <= 70  # ~50% of the 100 en rows
    assert sum(1 for i in a if i % 2 == 1) == 100  # de untouched
    # halving the rate can only shrink the accepted set (prefix property)
    c = {r.doc_id for r in target_mix_resample(d, {"en": 250_000}).collect()}
    assert c <= set(a)


def test_resample_invalid_rate_raises(spark):
    with pytest.raises(ValueError):
        target_mix_resample(_classed(spark), {"en": 2_000_000})


def test_chunks_plan_has_no_shuffle(spark):
    d = _docs(spark, [(1, "a b c d e f g h")])
    plan = token_chunks(d, size=4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
