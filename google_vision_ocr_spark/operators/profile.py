"""Column profiling — the ANALYZE-style data-quality report a pipeline
runs before trusting a new corpus drop: per column, null count, distinct
count, and min/max (stringified so heterogeneous columns stack into one
tidy frame).

One job, one pass: all per-column aggregates ride a single ``agg`` (for
k columns Spark plans one Expand + hash-aggregate for the k exact
DISTINCTs), and the 1-row result is unpivoted driver-side-free with
``stack``.  Exact distinct counts are the *audit* mode; at 100 TB pass
``exact=False`` and every distinct becomes an ``approx_count_distinct``
HLL sketch — no Expand, pure partial+final agg, one scan at any scale
(±~2.3% standard error, the documented trade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_depth_histogram(
    df: DataFrame,
    col: str = "value",
    bins: int = 10,
    unit: int = 100,
) -> DataFrame:
    """Exact equi-depth histogram of a numeric column — the
    optimizer-statistics shape (each bin holds ~n/bins rows), computed
    entirely in integers so two engines agree bit-for-bit.

    The column is quantized to ``unit`` fixed-point (cents by default),
    then: one map-side-combinable value→count aggregate, an exclusive
    running count over the DISTINCT values, and the closed-form bin
    assignment ``bin = (cum_prev · bins) div n`` — a distinct value
    whose first occupant rank falls in bin k carries all its
    duplicates there (the standard duplicate-merging rule; heavy
    duplicates make bins uneven on purpose, which is exactly what a
    CBO wants to see).  No percentile interpolation, no float edges —
    interpolated quantiles differ across engines in the last ULP and
    flip boundary rows.

    Scale note: the running count is a single-partition window over
    the DISTINCT quantized values — bounded by the value domain (a
    56k-cent metric has ≤56k distinct cents at any corpus size), not
    by the row count.  For genuinely unbounded domains pre-bucket the
    domain coarsely first; the histogram of a quality score, price,
    length, or ratio is domain-bounded.  For quantiles over unbounded
    domains at 100 TB the mergeable log-bucket sketch is the path
    (operators/sketch.py::quantile_sketch_build — fixed counter count,
    per-segment merge, same gate-proofed determinism)."""
    from pyspark.sql import Window

    cents = F.round(F.col(col) * unit).cast("bigint")
    counts = df.select(cents.alias("q")).groupBy("q").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    n = counts.agg(F.sum("cnt").alias("__n"))
    w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
    return (
        counts.withColumn(
            "cum_prev", F.coalesce(F.sum("cnt").over(w), F.lit(0))
        )
        .crossJoin(F.broadcast(n))
        .select(
            F.expr(f"(cum_prev * {bins}) div __n").alias("bin"),
            "q",
            "cnt",
        )
        .groupBy("bin")
        .agg(
            F.sum("cnt").alias("n_rows"),
            (F.min("q").cast("double") / F.lit(float(unit))).alias("lo_value"),
            (F.max("q").cast("double") / F.lit(float(unit))).alias("hi_value"),
        )
    )


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` into one row per
    column: (column_name, null_count, n_distinct, min_value, max_value).
    """
    cols = columns if columns is not None else df.columns
    missing = set(cols) - set(df.columns)
    if missing:
        raise ValueError(f"unknown columns: {sorted(missing)}")
    aggs = []
    for c in cols:
        col = F.col(c)
        nd = F.count_distinct(col) if exact else F.approx_count_distinct(col)
        aggs += [
            F.sum(col.isNull().cast("bigint")).alias(f"__nc_{c}"),
            nd.alias(f"__nd_{c}"),
            F.min(col).cast("string").alias(f"__mn_{c}"),
            F.max(col).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    tuples = ", ".join(
        f"'{c}', `__nc_{c}`, `__nd_{c}`, `__mn_{c}`, `__mx_{c}`" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {tuples}) AS "
        "(column_name, null_count, n_distinct, min_value, max_value)"
    )
