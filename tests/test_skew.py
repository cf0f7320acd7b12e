"""AQE skew-join evidence: the engine's answer to hot join keys.

The repo's static answers to skew are salting (operators/salted.py)
and bucketed pre-partitioning; this pins the RUNTIME answer — Spark's
adaptive skew-join split — actually engaging on a deliberately skewed
join, so the 100 TB claim ("skewed keys → AQE splits the straggler
partition") is demonstrated, not asserted."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def aggressive_aqe(spark):
    conf = spark.conf
    saved = {}
    tuned = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    for k, v in tuned.items():
        try:
            saved[k] = conf.get(k)
        except Exception:
            saved[k] = None
        conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            conf.unset(k)
        else:
            conf.set(k, v)


def test_aqe_splits_skewed_join_partition(aggressive_aqe):
    spark = aggressive_aqe
    # one pathological key (0) carrying ~97% of the fact rows, plus a
    # uniform tail — the cookie-banner/hot-host shape
    fact = spark.range(0, 60_000).select(
        F.when(F.col("id") % 30 != 0, F.lit(0))
        .otherwise(F.col("id") % 97)
        .alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
    )
    dim = spark.range(0, 97).select(
        F.col("id").alias("k"),
        F.concat(F.lit("dim-"), F.col("id")).alias("attr"),
    )
    joined = fact.join(dim, "k")
    # execute THIS DataFrame's query so its AdaptiveSparkPlan finalizes
    # (count() would plan a different query and leave this one unrun)
    assert len(joined.collect()) == 60_000
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "skew=true" in plan, (
        "AQE did not mark the hot partition as skewed:\n" + plan[:2000]
    )


def test_bloom_decontamination_plan_has_no_bench_shuffle(spark):
    """The bloom prefilter is a scan-side expression: the corpus side
    must reach the exact semi-join already pruned, with the benchmark
    side broadcast (never a corpus-wide shuffle on the shingle key)."""
    from google_vision_ocr_spark.operators.decontaminate import (
        contaminated_ids_bloom,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = d.filter(F.col("doc_id") % 50 == 0).select(
        F.substring("text", 1, 120).alias("text")
    )
    out = contaminated_ids_bloom(d, bench, k=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin LeftSemi" in plan.replace(
        "BroadcastHashJoin [shingle", "BroadcastHashJoin LeftSemi [shingle"
    ) or "LeftSemi" in plan
    # exactly the broadcast for the semi-join; no SortMergeJoin on the
    # corpus shingles
    assert "SortMergeJoin" not in plan
