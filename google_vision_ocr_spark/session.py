"""SparkSession factory with scale-appropriate defaults.

Tuned for the target execution model (SURVEY.md §4): Arrow-vectorized
Python stages, AQE with skew handling, explicit shuffle partitioning.
On a real cluster the same confs apply; only ``master`` changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "google-vision-ocr-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cpus, 8)))
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # Scan split size (guide §6): the bench inputs are single files
        # of 3-132 MB, so the 128 MB default hands a whole table to one
        # task and leaves a 32-core box idle through every scan-fused
        # stage (r7: tpch_q1's 132 MB lineitem scanned with 2 tasks).
        # 16 MB locally splits them to row-group granularity; on a real
        # cluster with TB-scale inputs set SPARK_GRAFT_MAX_PARTITION_BYTES
        # to 512 MB - 1 GB (large sequential scans want FEWER, larger
        # splits — guide §2.2/§6); the knob stays parameterised so the
        # local default never leaks into a production deployment.
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16777216"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # saveAsTable (bucketed layouts) must never litter the repo cwd
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"))
        .config("spark.driver.extraJavaOptions",
                "-Dderby.system.home=/tmp/spark_graft_derby")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
