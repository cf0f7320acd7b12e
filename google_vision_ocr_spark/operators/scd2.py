"""Type-2 (SCD2) history build: collapse an event stream into validity
intervals per key — one row per run of consecutive identical states,
with [valid_from, valid_to) bounds and the next run's start closing the
previous one.

Shape: gaps-and-islands (lag → change flag → running sum → group), all
windows partitioned by the entity key.  That key is *bounded per key*
(one user's events), so unlike a lang- or digest-partitioned window
this is skew-safe at corpus scale: the per-task work is one user's
history, never a corpus-wide sort.  Two shuffles total (the window
partitioning is reused by the groupBy on the same key).

Timestamps are surfaced as epoch-microsecond BIGINTs with -1 for the
open (current) interval — nullable TIMESTAMP columns hash differently
between engines (ns vs us epochs), bigint sentinels don't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def type2_history(
    df: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Return (key, state, valid_from_us, valid_to_us, n_events) — one
    row per maximal run of identical ``state_col`` per key, ordered by
    (ts, tiebreak) so duplicate timestamps resolve deterministically."""
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changed = (
        F.when(F.lag(state_col, 1).over(w).isNull(), F.lit(1))
        .when(F.lag(state_col, 1).over(w) != F.col(state_col), F.lit(1))
        .otherwise(F.lit(0))
    )
    runs = (
        df.select(key_col, state_col, ts_col, tiebreak_col)
        .withColumn("__run", F.sum(changed).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(key_col, "__run", state_col)
        .agg(
            F.min(ts_us).alias("valid_from_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    w_runs = Window.partitionBy(key_col).orderBy("__run")
    return runs.select(
        F.col(key_col),
        F.col(state_col).alias("state"),
        F.col("valid_from_us"),
        F.coalesce(F.lead("valid_from_us", 1).over(w_runs), F.lit(-1))
        .alias("valid_to_us"),
        F.col("n_events"),
    )
