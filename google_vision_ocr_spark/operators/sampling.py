"""Deterministic corpus splitting / sampling.

A training pipeline needs *reproducible* splits: the same document must
land in the same split on every run, on any cluster size, with no RNG
state — so the assignment is a pure function of the document id
(md5-bucket hashing, the standard practice).  Everything here is JVM
built-ins: `md5` + `conv` + arithmetic, whole-stage-codegen'd, no
shuffle (the split column is computed in the scan's project).

At 100 TB this matters because the split can be used as a partition
filter: `WHERE split = 'train'` prunes at the scan, and the assignment
never needs a join against a membership table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_bucket(col: Column, n_buckets: int = 100) -> Column:
    """Stable bucket in [0, n_buckets) from the md5 of a value's string
    form (first 8 hex digits — uniform, engine-independent)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("bigint") % n_buckets
    )


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Attach ``bucket`` (0-99) and ``split`` ∈ {train,val,test} columns.

    Pure function of the id: stable across runs, partitionings and
    cluster sizes; no sampling RNG, no driver state.
    """
    bucket = md5_bucket(F.col(id_col))
    return df.withColumn("bucket", bucket).withColumn(
        "split",
        F.when(F.col("bucket") < train_pct, F.lit("train"))
        .when(F.col("bucket") < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def target_mix_resample(
    df: DataFrame,
    rates_ppm: dict[str, int],
    class_col: str = "lang",
    id_col: str = "doc_id",
    default_ppm: int = 1_000_000,
) -> DataFrame:
    """Importance-style resampling to a target class mix: keep a row of
    class ``c`` with probability ``rates_ppm[c] / 1e6``, decided by the
    md5 hash of its (class, id) pair — the DSIR-flavoured "rebalance the
    corpus toward a target distribution" step, made fully deterministic.

    Rates are integer PARTS-PER-MILLION on purpose: the accept test is
    ``hash_bucket < rate_ppm`` in integers, so there is no float
    threshold for two engines (or two runs) to round differently — the
    same reason the money queries use integer cents.  Scan-side only:
    no shuffle, no RNG state, resumable and partition-count-independent.
    """
    key = F.concat_ws(
        "\x1f", F.col(class_col).cast("string"), F.col(id_col).cast("string")
    )
    bucket = md5_bucket(key, 1_000_000)
    rate = F.lit(default_ppm)
    for cls, ppm in sorted(rates_ppm.items()):
        if not (0 <= ppm <= 1_000_000):
            raise ValueError(f"rate for {cls!r} must be in [0, 1e6], got {ppm}")
        rate = F.when(F.col(class_col) == cls, F.lit(ppm)).otherwise(rate)
    return df.filter(bucket < rate)


def stratified_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    pct: int = 10,
) -> DataFrame:
    """Deterministic ~pct% sample *within each stratum*: hash the
    (stratum, id) pair so every stratum is sampled independently and
    reproducibly — no `sampleBy` RNG, safe to re-run incrementally."""
    key = F.concat_ws("\x1f", F.col(strata_col).cast("string"), F.col(id_col).cast("string"))
    return df.filter(md5_bucket(key) < pct)
