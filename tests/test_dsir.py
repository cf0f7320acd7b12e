"""DSIR importance resampling (operators/dsir.py)."""

from pyspark.sql import functions as F


def _toy(spark):
    # 3 target docs of style A, 6 raw style-A docs, 9 style-B docs
    rows = []
    for i in range(9):
        style_a = i % 3 != 2
        base = "alpha beta gamma delta" if style_a else "omega psi chi phi"
        rows.append((i, base + f" filler{i % 2}", 1 if i < 2 else 0))
    return spark.createDataFrame(rows, ["doc_id", "text", "is_target"])


def test_dsir_selects_target_style(spark):
    from google_vision_ocr_spark.operators.dsir import dsir_scores

    out = {r["doc_id"]: r for r in dsir_scores(_toy(spark)).collect()}
    assert len(out) == 9
    a_ids = [i for i in range(9) if i % 3 != 2]
    b_ids = [i for i in range(9) if i % 3 == 2]
    # style-A docs (sharing the seed's vocabulary) outrank style-B
    assert min(out[i]["avg_micro"] for i in a_ids) > max(
        out[i]["avg_micro"] for i in b_ids
    )
    assert all(out[i]["selected"] == 1 for i in a_ids if i >= 2)  # non-seed
    assert all(out[i]["selected"] == 0 for i in b_ids)


def test_dsir_drops_empty_docs_and_counts_features(spark):
    from google_vision_ocr_spark.operators.dsir import dsir_scores

    df = spark.createDataFrame(
        [(1, "a b c", 1), (2, "", 0), (3, "a b", 0)],
        ["doc_id", "text", "is_target"],
    )
    out = {r["doc_id"]: r for r in dsir_scores(df).collect()}
    assert set(out) == {1, 3}
    # 3 unigrams + 2 bigrams / 2 unigrams + 1 bigram
    assert out[1]["n_feats"] == 5 and out[3]["n_feats"] == 3


def test_dsir_plan_broadcasts_model_no_cartesian(spark):
    from google_vision_ocr_spark.operators.dsir import dsir_scores

    plan = (
        dsir_scores(_toy(spark))._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan       # model + log-ratio joins
    assert "CartesianProduct" not in plan    # scalars ride broadcast NLJ
    assert "SortMergeJoin" not in plan


def test_dsir_partitioning_invariant(spark):
    from google_vision_ocr_spark.operators.dsir import dsir_scores

    base = _toy(spark)
    a = {r["doc_id"]: tuple(r) for r in dsir_scores(base.repartition(1)).collect()}
    b = {r["doc_id"]: tuple(r) for r in dsir_scores(base.repartition(7)).collect()}
    assert a == b
