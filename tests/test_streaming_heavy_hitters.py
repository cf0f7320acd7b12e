"""Stateful threshold-crossing detector: exactly-once emission across
micro-batches, key-set parity with the batch count-filter twin."""

import pandas as pd
from pyspark.sql import functions as F

from google_vision_ocr_spark.streaming.events import (
    read_event_stream,
    run_available_now,
)
from google_vision_ocr_spark.streaming.heavy_hitters import (
    first_crossing_batch,
    power_users_batch,
    power_users_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_crossings_match_batch_key_set(spark, tmp_path):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # pick a threshold that splits the users AND sits low enough that
    # heavy users cross it mid-stream (≈ 70% of the heaviest user's
    # total: with events arriving in ~4 equal shards, that user crosses
    # on shard 3 of 4 — strictly before their final count)
    counts = events.groupBy("user_id").count().toPandas()["count"]
    threshold = int(counts.max() * 0.7)
    assert counts.min() < threshold <= counts.max()

    # shard the events into 4 explicit files so state must survive
    # across multiple drains (AQE coalesces a repartition to 1 file)
    import glob
    import os
    import shutil

    feed = tmp_path / "feed"
    feed.mkdir()
    for i in range(4):
        shard_dir = tmp_path / f"shard{i}"
        (
            events.filter(F.pmod(F.col("event_id"), F.lit(4)) == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(shard_dir))
        )
        (part,) = glob.glob(str(shard_dir / "part-*.parquet"))
        shutil.copy(part, feed / f"events_{i:03d}.parquet")

    # four successive drains against the SAME checkpoint, one shard
    # arriving per run: each resumes from persisted state, so lifetime
    # counts must carry across runs and a user crossing mid-stream
    # reports a count strictly below their final total
    files = sorted(glob.glob(str(feed / "events_*.parquet")))
    live = tmp_path / "live"
    live.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        # parquet sink (the memory sink cannot recover a checkpoint)
        q = (
            power_users_stream(
                read_event_stream(spark, str(live), glob="events*.parquet"),
                threshold,
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for f in files:
        shutil.copy(f, live / os.path.basename(f))
        drain()
    got = spark.read.parquet(out).toPandas()

    batch = power_users_batch(events, threshold).toPandas()
    assert set(got["user_id"]) == set(batch["user_id"])
    # exactly-once: no duplicate emissions
    assert got["user_id"].is_unique
    # the crossing count is whatever the batching exposed, but bounded
    merged = got.merge(batch, on="user_id")
    assert (merged["crossed_at_count"] >= threshold).all()
    assert (merged["crossed_at_count"] <= merged["total"]).all()
    # multi-batch statefulness actually exercised: at least one user
    # crossed with fewer events than their lifetime total
    assert (merged["crossed_at_count"] < merged["total"]).any()
    # batch==stream, gate edition: the deterministic first-crossing
    # twin (the events_first_crossing oracle query) must emit exactly
    # the same user set as the checkpointed stream — one row per
    # crossing user, at running-rank == threshold
    fc = first_crossing_batch(events, threshold).toPandas()
    assert set(fc["user_id"]) == set(got["user_id"])
    assert fc["user_id"].is_unique
    assert (fc["threshold"] == threshold).all()
    assert (fc["total_events"] >= threshold).all()


def test_batch_twin_threshold_edge(spark):
    rows = [(i, u) for u, n in [(1, 3), (2, 5), (3, 4)] for i in range(n)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id"])
    )
    got = {
        r["user_id"]: r["total"]
        for r in power_users_batch(df, threshold=4).collect()
    }
    assert got == {2: 5, 3: 4}
