"""Token-budget shard packing — grouping documents into training shards.

Tokenizer/training jobs consume fixed-budget shards ("pack documents
until ~N tokens, start the next shard").  Exact greedy packing is
inherently sequential; the distributed version is the standard
cumulative-sum approximation: a document belongs to the shard where its
token run *starts* (``floor((cumsum - tokens) / budget)``), so shards
may overshoot the budget by at most one document — the same tolerance
sequence-packing loaders use.

Scale note: an unpartitioned window is a single-reducer sort.  Pack
WITHIN a partition key (language, split, day) — the window is
``PARTITION BY part ORDER BY id`` — so each partition packs
independently and in parallel, which is also what a sharded training
layout wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_shards(
    docs: DataFrame,
    budget: int,
    part_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "ws_tokens",
) -> DataFrame:
    """Attach ``shard_id`` (0-based within each partition key)."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run_end = F.sum(F.col(tokens_col)).over(w)
    run_start = run_end - F.col(tokens_col)
    return docs.withColumn(
        "shard_id", F.floor(run_start / F.lit(budget)).cast("bigint")
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
