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
