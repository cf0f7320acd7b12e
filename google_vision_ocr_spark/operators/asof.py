"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

The training-data shape: attach to each fact row (a purchase, a model
checkpoint, a crawl snapshot) the most recent earlier row from a
reference stream for the same key (the user's last page view, the
latest config before the run, the page's previous crawl).  Databases
ship it as ``ASOF JOIN``; Spark has no native operator, and the naive
formulation — an inequality theta-join — is a per-key cartesian.

Distributed shape used here (the standard union trick, one shuffle):

1. tag both streams and union them (right rows carry the payload
   columns, left rows carry null payloads);
2. one window per key ordered by ``(ts, side, tiebreak)`` takes
   ``last(payload, ignorenulls=True)`` over
   ``ROWS UNBOUNDED PRECEDING..CURRENT ROW`` — each left row sees
   exactly the latest right row at-or-before it;
3. keep the left rows.

Cost: ONE shuffle of ``|L| + |R|`` rows on the key, and the per-key
window is bounded by events-per-key (bounded in any real stream), not
corpus size — contrast the theta-join's ``|L|·|R|`` per key.  Ordering
right rows before left rows at equal timestamps gives ``<=`` semantics
(``allow_equal=True``); flipping the side order gives strict ``<``.
The construction is replayed verbatim in the DuckDB oracle
(``asof_purchase_view``), so tie handling is pinned, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    payload_cols: list[str],
    tiebreak_col: str | None = None,
    allow_equal: bool = True,
) -> DataFrame:
    """Return ``left`` with ``payload_cols`` from the as-of row of
    ``right`` (null when no earlier right row exists for the key).

    Both frames carry ``key_cols``, ``ts_col`` and (if given)
    ``tiebreak_col``; ``payload_cols`` exist on ``right`` and must not
    collide with ``left`` columns.  Among right rows tied on the
    timestamp, the largest tiebreak wins; the tiebreak also makes the
    result deterministic when a left and right timestamp collide.
    """
    shared = list(key_cols) + [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
        F.lit(1).alias("__side"),
    )
    r_tag = right.select(
        *[F.col(c) for c in shared],
        *[F.col(c) for c in payload_cols],
        F.lit(0).alias("__side"),
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    side_order = F.col("__side").asc() if allow_equal else F.col("__side").desc()
    order = [F.col(ts_col).asc(), side_order]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[c for c in u.columns if c not in payload_cols and c != "__side"],
        F.col("__side"),
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in payload_cols],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")
