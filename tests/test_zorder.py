"""Unit coverage for Morton/Z-order keys."""

import random

import pytest
from pyspark.sql import functions as F

from google_vision_ocr_spark.functions.zorder import (
    morton2,
    morton2_decode,
    morton2_sql,
)


def test_roundtrip_against_python_inverse(spark):
    rng = random.Random(7)
    pts = [(rng.randrange(65536), rng.randrange(65536)) for _ in range(500)]
    df = spark.createDataFrame(pts, "a bigint, b bigint")
    rows = df.select("a", "b", morton2(F.col("a"), F.col("b")).alias("z")).collect()
    for r in rows:
        assert morton2_decode(r.z) == (r.a, r.b)


def test_quadrant_prefix_locality(spark):
    # all points with a,b < 256 (low quadrant at bits=16) must sort
    # strictly before any point with a >= 32768 — the row-group
    # clustering property Z-order exists for
    df = spark.createDataFrame(
        [(a, b) for a in (0, 100, 255) for b in (0, 100, 255)]
        + [(40000, 0), (0, 40000)],
        "a bigint, b bigint",
    )
    rows = df.select("a", "b", morton2(F.col("a"), F.col("b")).alias("z")).collect()
    low = [r.z for r in rows if r.a < 256 and r.b < 256]
    high = [r.z for r in rows if r.a >= 32768 or r.b >= 32768]
    assert max(low) < min(high)


def test_sql_twin_matches_column_form(spark):
    df = spark.createDataFrame(
        [(i * 37 % 65536, i * 101 % 65536) for i in range(200)],
        "a bigint, b bigint",
    )
    via_col = df.select(morton2(F.col("a"), F.col("b")).alias("z"))
    via_sql = df.selectExpr(f"{morton2_sql('a', 'b')} AS z")
    assert sorted(r.z for r in via_col.collect()) == sorted(
        r.z for r in via_sql.collect()
    )


def test_bits_validation():
    with pytest.raises(ValueError):
        morton2_sql("a", "b", bits=0)
    with pytest.raises(ValueError):
        morton2_sql("a", "b", bits=32)
