"""Stateful streaming sessionization equals the batch twin on the same
drained input (closed sessions only — a drained bounded stream never
fires the idle timeout that would close each user's final session)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from google_vision_ocr_spark.streaming.events import read_event_stream, run_available_now
from google_vision_ocr_spark.streaming.sessions import sessionize_batch, sessionize_stream

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_sessions_match_batch(spark, tmp_path):
    stream = read_event_stream(spark, SF_DIR)
    got = run_available_now(
        sessionize_stream(stream), str(tmp_path / "ckpt"), query_name="sessions"
    ).collect()
    got_set = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
               for r in got}

    batch = sessionize_batch(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    # drop each user's LAST session (still open in the streaming view)
    w = Window.partitionBy("user_id").orderBy(F.col("session_start").desc())
    closed = batch.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") > 1)
    exp_set = {(r["user_id"], r["session_start"], r["session_end"], r["n_events"])
               for r in closed.collect()}

    assert len(exp_set) > 0
    assert got_set == exp_set


def test_batch_sessionizer_gap_semantics(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base), (1, base + dt.timedelta(minutes=10)),          # session A (2)
        (1, base + dt.timedelta(minutes=50)),                      # session B (1)
        (2, base),                                                 # session C (1)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = sorted(
        ((r["user_id"], r["n_events"]) for r in sessionize_batch(df).collect())
    )
    assert got == [(1, 1), (1, 2), (2, 1)]
