"""Unit coverage for snapshot_diff (CDC) and its inverse relationship
with merge_upsert."""

import pytest
from pyspark.sql import functions as F

from google_vision_ocr_spark.operators.merge import merge_upsert, snapshot_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string, n bigint")


def test_classifies_insert_update_delete_and_drops_unchanged(spark):
    old = _snap(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)])
    new = _snap(spark, [(1, "a", 10), (2, "B", 20), (5, "e", 50), (4, None, 40)])
    out = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out[2].op == "update" and out[2].v == "B"
    assert out[3].op == "delete" and out[3].v == "c"  # delete carries old values
    assert out[5].op == "insert" and out[5].v == "e"
    assert 1 not in out and 4 not in out  # unchanged (incl. null == null)


def test_null_transitions_are_updates(spark):
    old = _snap(spark, [(1, None, 10), (2, "x", 20)])
    new = _snap(spark, [(1, "now", 10), (2, None, 20)])
    out = {r.k: r for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out[1].op == "update" and out[1].v == "now"
    assert out[2].op == "update" and out[2].v is None


def test_merge_of_diff_reconstructs_new_snapshot(spark):
    old = _snap(spark, [(i, f"v{i}", i * 10) for i in range(20)])
    new = _snap(
        spark,
        [(i, f"v{i}" if i % 3 else f"V{i}", i * 10) for i in range(20) if i % 7]
        + [(100, "fresh", 0)],
    )
    diff = snapshot_diff(old, new, ["k"]).withColumn(
        "is_delete", F.col("op") == "delete"
    ).drop("op")
    rebuilt = merge_upsert(old, diff, ["k"], delete_col="is_delete")
    assert sorted(rebuilt.collect()) == sorted(new.collect())


def test_schema_mismatch_raises(spark):
    old = _snap(spark, [(1, "a", 1)])
    with pytest.raises(ValueError):
        snapshot_diff(old, old.select("k", "v"), ["k"])
