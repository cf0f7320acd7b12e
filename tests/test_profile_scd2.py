"""Unit coverage for profile_columns and type2_history."""

import datetime as dt

import pytest

from google_vision_ocr_spark.operators.profile import profile_columns
from google_vision_ocr_spark.operators.scd2 import type2_history


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "k bigint, v string",
    )
    rows = {r.column_name: r for r in profile_columns(df).collect()}
    assert rows["k"].null_count == 1
    assert rows["k"].n_distinct == 3
    assert rows["k"].min_value == "1" and rows["k"].max_value == "3"
    assert rows["v"].null_count == 1
    assert rows["v"].n_distinct == 2
    assert rows["v"].min_value == "a" and rows["v"].max_value == "b"


def test_profile_column_subset_and_unknown_raises(spark):
    df = spark.createDataFrame([(1, "a")], "k bigint, v string")
    out = profile_columns(df, columns=["v"]).collect()
    assert [r.column_name for r in out] == ["v"]
    with pytest.raises(ValueError):
        profile_columns(df, columns=["nope"])


def test_profile_approx_mode_close_to_exact(spark):
    df = spark.range(1000).selectExpr("id", "CAST(id % 37 AS STRING) AS v")
    rows = {r.column_name: r for r in profile_columns(df, exact=False).collect()}
    assert abs(rows["v"].n_distinct - 37) <= 4  # HLL ±~2.3% typical, slack for tiny n
    assert rows["id"].null_count == 0


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )


def test_scd2_runs_and_interval_bounds(spark):
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0, 7, "view"),
        (2, t0 + dt.timedelta(seconds=10), 7, "view"),
        (3, t0 + dt.timedelta(seconds=20), 7, "purchase"),
        (4, t0 + dt.timedelta(seconds=30), 7, "view"),
        (5, t0, 8, "click"),
    ]
    out = sorted(
        type2_history(_ev(spark, rows)).collect(),
        key=lambda r: (r.user_id, r.valid_from_us),
    )
    u7 = [r for r in out if r.user_id == 7]
    assert [r.state for r in u7] == ["view", "purchase", "view"]
    assert [r.n_events for r in u7] == [2, 1, 1]
    # each interval closes exactly where the next opens; last is open (-1)
    assert u7[0].valid_to_us == u7[1].valid_from_us
    assert u7[1].valid_to_us == u7[2].valid_from_us
    assert u7[2].valid_to_us == -1
    u8 = [r for r in out if r.user_id == 8]
    assert len(u8) == 1 and u8[0].valid_to_us == -1


def test_scd2_duplicate_ts_tiebreaks_on_event_id(spark):
    t0 = dt.datetime(2026, 1, 1)
    rows = [(2, t0, 9, "b"), (1, t0, 9, "a")]  # same ts — event_id orders them
    out = type2_history(_ev(spark, rows)).collect()
    # id 1 ('a') sorts first, so 'a' closes at t0 (where 'b' opens) and 'b' stays open
    states = {r.state: r for r in out}
    assert states["a"].valid_to_us == states["b"].valid_from_us
    assert states["b"].valid_to_us == -1
