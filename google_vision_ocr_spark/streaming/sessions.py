"""Custom stateful streaming operator: gap-based sessionization.

The reference has no streaming, but a crawl-event stream's natural
stateful query — "group a user's events into sessions separated by
idle gaps" — is exactly the shape `applyInPandasWithState` exists for:
per-key mutable state (current session's start/last/count) carried
across micro-batches, with an idle timeout that closes sessions when
the stream goes quiet.

Batch twin (:func:`sessionize_batch`) uses the classic lag/window
formulation; the streaming and batch results are compared in tests on
the same drained input.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events int"
)
STATE_SCHEMA = "start long, last long, n int"

GAP_S = 30 * 60  # 30-minute idle gap closes a session


def _sessionize_one_group(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame({
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start, unit="us")],
            "session_end": [pd.Timestamp(last, unit="us")],
            "n_events": [n],
        })
        return
    ts_all = []
    for pdf in pdfs:
        ts_all.extend(pdf["ts"].astype("int64") // 1000)  # ns -> us
    ts_all.sort()
    out = {"user_id": [], "session_start": [], "session_end": [], "n_events": []}
    if state.exists:
        start, last, n = state.get
    else:
        start = last = ts_all[0]
        n = 0
        ts_all = ts_all  # first event counted in the loop below
    for t in ts_all:
        if n > 0 and t - last > GAP_S * 1_000_000:
            out["user_id"].append(user_id)
            out["session_start"].append(pd.Timestamp(start, unit="us"))
            out["session_end"].append(pd.Timestamp(last, unit="us"))
            out["n_events"].append(n)
            start, n = t, 0
        last = max(last, t)
        n += 1
    state.update((int(start), int(last), int(n)))
    state.setTimeoutDuration(GAP_S * 1000)
    if out["user_id"]:
        yield pd.DataFrame(out)


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Streaming gap-sessionizer; emits closed sessions."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_one_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_s: int = GAP_S) -> DataFrame:
    """Batch twin: lag → gap marker → running session id → aggregate."""
    w = Window.partitionBy("user_id").orderBy("ts")
    # parquet timestamps may surface as TIMESTAMP_NTZ, which cannot cast
    # straight to long; go through timestamp_ltz (session tz is UTC)
    epoch_s = F.col("ts").cast("timestamp_ltz").cast("long")
    marked = events.withColumn(
        "new_session",
        (epoch_s - F.lag(epoch_s, 1, 0).over(w) > gap_s).cast("int"),
    )
    with_sid = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_sid.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).cast("int").alias("n_events"),
    ).drop("session_id")
