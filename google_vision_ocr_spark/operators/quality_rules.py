"""Gopher-style repetition quality signals (Rae et al. 2021, §A1.1).

Web-corpus curation drops documents dominated by repeated lines or
paragraphs.  These metrics are computed entirely with JVM higher-order
functions over the in-row line array — **zero shuffle**: for a
per-document signal, exploding lines into a groupBy would shuffle the
whole corpus text twice; the in-row O(lines²) comparison is bounded by
document size (web pages: tens-to-hundreds of lines) and stays inside
whole-stage codegen.

Metrics (line-based; '\\n'-split, empty lines ignored):
- ``dup_line_frac``      — fraction of lines that are duplicates
  (1 - distinct/total).
- ``dup_line_char_frac`` — fraction of line characters inside lines
  that occur more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LINES = r"filter(split({col}, '\n'), x -> x <> '')"


def repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach ``n_lines``, ``dup_line_frac``, ``dup_line_char_frac``."""
    lines = _LINES.format(col=text_col)
    n_lines = f"size({lines})"
    dup_chars = (
        f"aggregate(filter({lines}, x -> size(filter({lines}, y -> y = x)) > 1), "
        f"0L, (acc, x) -> acc + length(x))"
    )
    total_chars = f"aggregate({lines}, 0L, (acc, x) -> acc + length(x))"
    return (
        df.withColumn("n_lines", F.expr(n_lines).cast("bigint"))
        .withColumn(
            "dup_line_frac",
            F.when(
                F.col("n_lines") > 0,
                1.0 - F.expr(f"size(array_distinct({lines}))") / F.col("n_lines"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "dup_line_char_frac",
            F.when(
                F.expr(total_chars) > 0,
                F.expr(dup_chars) / F.expr(total_chars),
            ).otherwise(F.lit(0.0)),
        )
    )


def repetition_gate(
    df: DataFrame,
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
) -> DataFrame:
    """Drop documents failing the Gopher repetition thresholds."""
    scored = repetition_metrics(df, text_col)
    return scored.filter(
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_line_char_frac") <= max_dup_line_char_frac)
    ).drop("n_lines", "dup_line_frac", "dup_line_char_frac")
