"""Unit coverage for the weighted-median Arrow UDAF."""

from google_vision_ocr_spark.operators.udaf import weighted_median_by


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v double, w bigint")


def test_weighted_median_hand_computed(spark):
    # g=a: values 1(w3), 2(w1), 10(w2) -> total 6, half 3 -> v=1 reaches it
    # g=b: values 5(w1), 7(w1) -> total 2 -> lower median = 5
    rows = [("a", 1.0, 3), ("a", 2.0, 1), ("a", 10.0, 2),
            ("b", 5.0, 1), ("b", 7.0, 1)]
    out = {r.g: r.weighted_median for r in
           weighted_median_by(_df(spark, rows), "g", "v", "w").collect()}
    assert out == {"a": 1.0, "b": 5.0}


def test_weight_shifts_the_median(spark):
    light = [("g", float(v), 1) for v in range(1, 10)]
    out1 = weighted_median_by(_df(spark, light), "g", "v", "w").collect()[0]
    assert out1.weighted_median == 5.0
    heavy = light + [("g", 9.0, 100)]
    out2 = weighted_median_by(_df(spark, heavy), "g", "v", "w").collect()[0]
    assert out2.weighted_median == 9.0


def test_duplicate_values_merge_before_selection(spark):
    # three copies of 2.0 (w1 each) behave exactly like one 2.0 (w3)
    a = [("g", 2.0, 1)] * 3 + [("g", 8.0, 2)]
    b = [("g", 2.0, 3), ("g", 8.0, 2)]
    ra = weighted_median_by(_df(spark, a), "g", "v", "w").collect()[0]
    rb = weighted_median_by(_df(spark, b), "g", "v", "w").collect()[0]
    assert ra.weighted_median == rb.weighted_median == 2.0
