"""Scale-adaptive fan-out for CPU-bound stages fed by unsplittable scans.

Parquet scans parallelize at row-group granularity: a table written as
one file with one row group yields ONE scan task no matter how small
``spark.sql.files.maxPartitionBytes`` is, so every stage fused onto the
scan (Python recognition, signature hashing, per-row expression work)
runs on a single core while the rest of the cluster idles — the
guide-§2.5 "input skew" shape (one huge unsplittable input ⇒
repartition immediately after the read).

:func:`fanout` applies that fix *adaptively*: it repartitions only when
the frame's current partitioning underparallelizes the cluster
(``current < target``), so at 100 TB — where the scan already carries
thousands of row-group splits — it is a no-op and never coalesces or
adds a shuffle.  The target is ``sc.defaultParallelism`` (cluster-wide
cores; 32 on the bench's ``local[32]``), overridable via
``SPARK_GRAFT_FANOUT_PARTITIONS``; the explicit-``n`` repartition is
deliberate — AQE's partition coalescing targets
``advisoryPartitionSizeInBytes`` (64 MB) and would collapse a
few-MB-but-CPU-heavy shuffle right back to one partition.

The partition-count probe (``df.rdd.getNumPartitions()``) plans the
frame but runs no job; measured ~40 ms warm on this box — noise next
to the multi-second single-core stage it prevents.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def fanout_target(df: DataFrame) -> int:
    env = os.environ.get("SPARK_GRAFT_FANOUT_PARTITIONS")
    if env:
        return int(env)
    return df.sparkSession.sparkContext.defaultParallelism


def fanout(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition ``df`` to cluster parallelism iff it currently has
    fewer partitions; hash on ``cols`` when given (deterministic keys —
    never ``rand()``, see SPARK-38388), round-robin otherwise."""
    target = fanout_target(df)
    if target <= 1:
        return df
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive: unplannable frame
        current = target
    if current >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)
