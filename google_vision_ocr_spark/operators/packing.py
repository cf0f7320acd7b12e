"""Token-budget shard packing — grouping documents into training shards.

Tokenizer/training jobs consume fixed-budget shards ("pack documents
until ~N tokens, start the next shard").  Exact greedy packing is
inherently sequential; the distributed version is the standard
cumulative-sum approximation: a document belongs to the shard where its
token run *starts* (``floor((cumsum - tokens) / budget)``), so shards
may overshoot the budget by at most one document — the same tolerance
sequence-packing loaders use.

Scale note: a window ``PARTITION BY part_col ORDER BY id`` is a
single-reducer sort per partition KEY — English is ~half of any web
corpus, so at 100 TB one task would sort half the dataset.  The
implementation here is the classic two-pass distributed prefix sum
instead:

1. ``repartitionByRange(part, id)`` — rows land in Spark partitions
   that are contiguous in the global ``(part, id)`` order, each bounded
   by partition SIZE (``maxPartitionBytes``-ish), not key cardinality.
2. per-``(spark_partition, part)`` token subtotals — one tiny
   map-side-combinable aggregation (≤ a few rows per Spark partition).
3. running offsets over that tiny frame (a window over ~#partitions
   rows — driver-scale, no skew), broadcast back.
4. a local cumsum windowed by ``(spark_partition, part)`` — bounded by
   Spark partition size — plus the broadcast offset.

The ranged frame is persisted (registered with :mod:`..cache`) so the
``spark_partition_id`` assignment is computed exactly once and stays
consistent between the subtotal pass and the final pass; at real scale
you would write it to storage instead (see ``docs/SCALE.md``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import cache


def pack_shards(
    docs: DataFrame,
    budget: int,
    part_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "ws_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach ``shard_id`` (0-based within each partition key).

    Per-key work is bounded by Spark partition count, not key
    cardinality: no window ever partitions by ``part_col`` alone over
    the full data (asserted in ``tests/test_plan_shapes.py``).
    """
    spark = docs.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = cache.track(
        docs.repartitionByRange(n, F.col(part_col), F.col(id_col))
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    sub = ranged.groupBy("__pid", part_col).agg(F.sum(tokens_col).alias("__sub"))
    w_off = (
        Window.partitionBy(part_col)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sub.select(
        "__pid",
        part_col,
        F.coalesce(F.sum("__sub").over(w_off), F.lit(0)).alias("__off"),
    )
    w_local = (
        Window.partitionBy("__pid", part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run_end = F.sum(F.col(tokens_col)).over(w_local) + F.col("__off")
    return (
        ranged.join(F.broadcast(offsets), ["__pid", part_col])
        .withColumn(
            "shard_id",
            F.floor((run_end - F.col(tokens_col)) / F.lit(budget)).cast("bigint"),
        )
        .drop("__pid", "__off")
    )


def shard_manifest(
    docs: DataFrame,
    budget: int,
    part_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "ws_tokens",
) -> DataFrame:
    """One row per (partition, shard): doc count, token total, id range."""
    packed = pack_shards(docs, budget, part_col, id_col, tokens_col)
    return packed.groupBy(part_col, "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens_col).cast("bigint").alias("sum_tokens"),
        F.min(id_col).alias("first_id"),
        F.max(id_col).alias("last_id"),
    )
