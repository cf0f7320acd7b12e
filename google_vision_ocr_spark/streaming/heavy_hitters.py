"""Stateful streaming threshold-crossing detector ("power users").

The streaming-side heavy-hitter primitive: per-key running counts
carried across micro-batches, with an EXACTLY-ONCE emission when a
key's lifetime count first crosses the threshold.  This is the shape
of every "alert when an entity gets hot" job — trending hosts,
abusive IPs, viral documents — where re-emitting on every batch (the
naive aggregation) floods downstream consumers.

State per key is two scalars (count, emitted), so memory is O(live
keys) regardless of stream length; at 10^12 events the key space is
what you bound (hash-fold keys or age out via timeouts).  The batch
twin (:func:`power_users_batch`) is the plain count-filter; parity on
a drained stream is the emitted KEY SET (the crossing count itself
legitimately depends on micro-batch boundaries — asserted to sit in
[threshold, total]).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CROSS_SCHEMA = "user_id bigint, crossed_at_count bigint"
STATE_SCHEMA = "cnt long, emitted boolean"


def make_crossing_tracker(threshold: int):
    def _track_one(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        cnt, emitted = state.get if state.exists else (0, False)
        for pdf in pdfs:
            cnt += len(pdf)
        fire = (not emitted) and cnt >= threshold
        state.update((int(cnt), bool(emitted or fire)))
        if fire:
            yield pd.DataFrame(
                {"user_id": [user_id], "crossed_at_count": [int(cnt)]}
            )

    return _track_one


def power_users_stream(events: DataFrame, threshold: int) -> DataFrame:
    """Emit each user exactly once, on the micro-batch where their
    lifetime event count first reaches ``threshold``."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_crossing_tracker(threshold),
        outputStructType=CROSS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def power_users_batch(events: DataFrame, threshold: int) -> DataFrame:
    """Batch twin: users whose total event count reaches threshold."""
    return (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("total"))
        .filter(F.col("total") >= threshold)
    )


def first_crossing_batch(events: DataFrame, threshold: int | None = None) -> DataFrame:
    """Deterministic batch twin of :func:`power_users_stream` suitable
    for the hash gate: for each user whose lifetime count reaches the
    threshold, the exact EVENT at which their running count (ordered
    by ts, event_id — a total order, so ties are impossible) first
    does.  The stream's ``crossed_at_count`` legitimately depends on
    micro-batch boundaries; this twin pins the batch-invariant part —
    WHO crosses and WHERE in their own history — which is also the
    stream's emitted key set (asserted in
    tests/test_streaming_heavy_hitters.py).

    ``threshold=None`` derives ``mean events/user + 1`` inside the
    plan (one scalar aggregation broadcast against the windowed rows —
    no driver action), which splits the users at any SF.  Windows
    partition by user_id: the bounded events-per-user shape, never
    corpus-scale."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = events.select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("__ts"),
        F.row_number().over(w).cast("bigint").alias("__rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("user_id"))
        .cast("bigint")
        .alias("total_events"),
    )
    if threshold is None:
        # exact integer mean events/user, +1 — one tiny scalar frame
        thr = events.agg(
            F.expr(
                "CAST(count(1) div count(DISTINCT user_id) + 1 AS BIGINT)"
            ).alias("threshold")
        )
    else:
        thr = events.sparkSession.range(1).select(
            F.lit(int(threshold)).cast("bigint").alias("threshold")
        )
    return (
        r.crossJoin(F.broadcast(thr))
        .filter(F.col("__rn") == F.col("threshold"))
        .select(
            "user_id",
            F.col("event_id").alias("crossed_event_id"),
            F.expr("unix_micros(__ts)").alias("crossed_us"),
            "total_events",
            "threshold",
        )
    )
