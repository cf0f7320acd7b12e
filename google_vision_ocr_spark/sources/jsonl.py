"""JSONL corpus sink — the lingua franca of LLM training data.

Writes a curated corpus as sharded ``*.json.gz`` (one JSON object per
line), the format downstream tokenizer/training jobs consume.  Thin on
purpose: Spark's JSON datasource already does distributed sharded
writes with compression; this wrapper pins the conventions that matter
at scale —

- **shard sizing** via ``records_per_shard`` → ``repartition(n)``
  computed from a count (a corpus written as 3 giant or 90k tiny files
  is equally painful to consume);
- **stable column subset + order** (schema drift in JSONL corpora is a
  silent downstream breaker);
- gzip by default (splittability doesn't matter for write-once shards
  consumed whole).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus in PERMISSIVE mode, returning
    ``(good_rows, bad_rows)`` — error-as-data for the ingest boundary.

    Third-party JSONL drops always contain some malformed lines; a
    FAILFAST read kills a 100 TB job on line one of shard 40k, and
    DROPMALFORMED silently changes the corpus.  PERMISSIVE with an
    explicit corrupt-record column keeps the job running AND the
    damage auditable: bad lines come back as (raw_line) rows the
    caller can count, sample, and quarantine — the same per-row
    error-capture posture as the extraction plan's ocr_error column.

    The schema must be explicit (never inferred: inference costs an
    extra full scan and locks in whatever the first shards happened
    to contain)."""
    full = StructType(
        list(schema.fields) + [StructField(corrupt_col, StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
    # Spark requires a materialization barrier (cache) before a
    # corrupt-record-only projection; checkpoint-free local cut
    df = df.cache()
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return good, bad


def write_jsonl_corpus(
    df: DataFrame,
    path: str,
    columns: list[str] | None = None,
    records_per_shard: int | None = None,
    compression: str = "gzip",
    mode: str = "overwrite",
) -> int:
    """Write ``df`` as sharded JSONL; returns the row count written.

    The frame is persisted around the count + write so an expensive
    upstream plan (a curate output, say) executes once, not twice."""
    base = (df.select(*columns) if columns else df).persist()
    try:
        n = base.count()
        out = base
        if records_per_shard:
            out = base.repartition(max(1, math.ceil(n / records_per_shard)))
        out.write.mode(mode).option("compression", compression).json(path)
    finally:
        base.unpersist()
    return n
