"""Custom aggregation via Arrow — the GROUPED_AGG pandas-UDF surface
(the one vectorized-UDF shape the engine didn't exercise yet; scalar
pandas UDFs, mapInArrow, mapInPandas, and applyInPandasWithState are
all in use elsewhere).

The demonstrator is an exact LOWER WEIGHTED MEDIAN: the smallest value
v whose cumulative weight reaches half the group's total.  Chosen
because it is (a) genuinely inexpressible as a built-in aggregate,
(b) still exactly replayable in SQL (per-distinct-value weight sums,
a running total, ``min(v) where 2·cum >= total`` — all integer
comparisons, no interpolation), so even the custom-UDAF path sits
under the cross-engine hash gate.

Scale note: a grouped-agg pandas UDF materializes each GROUP in one
worker's memory — legal only for bounded groups (an event-type's rows,
a user's history), never for data-scale keys.  For the unbounded case
the same rule decomposes into the pure-SQL form the oracle uses
(value-grain aggregate + running sum), which is the shape to prefer
whenever it is expressible; the UDAF exists for rules that are not.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _weighted_median_py(v: pd.Series, w: pd.Series) -> float:
    by_value = pd.DataFrame({"v": v, "w": w}).groupby("v", sort=True)["w"].sum()
    cum = by_value.cumsum()
    total = int(by_value.sum())
    # smallest value whose doubled cumulative weight reaches the total
    return float(cum.index[(2 * cum >= total).argmax()])


def weighted_median_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Exact lower weighted median of ``value_col`` per ``group_col``
    with integer weights from ``weight_col``.

    The UDF is built lazily per call: decorating at module scope needs
    an active SparkSession at IMPORT time, which breaks sessionless
    ``--py-files`` shipping (the round-2 curate lesson, pinned by
    tests/test_functions_config.py)."""
    udf = F.pandas_udf(_weighted_median_py, "double")
    return df.groupBy(group_col).agg(
        udf(F.col(value_col), F.col(weight_col)).alias("weighted_median")
    )
