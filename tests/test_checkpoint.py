"""M5: kill/resume — no completed bucket reprocessed, identical output."""

import pyarrow.parquet as pq
import pytest

from google_vision_ocr_spark import oracle
from google_vision_ocr_spark.plans.checkpoint import (
    completed_buckets,
    read_checkpointed_output,
    run_checkpointed_extract,
)


def test_kill_and_resume(spark, fixture_dir, tmp_path):
    out = str(tmp_path / "ckpt")
    df = spark.read.parquet(fixture_dir["pages"])

    # first run dies after bucket 2
    with pytest.raises(RuntimeError, match="injected failure"):
        run_checkpointed_extract(spark, df, out, n_buckets=6, fail_after_bucket=2)
    done_after_crash = completed_buckets(out)
    assert sorted(done_after_crash) == [0, 1, 2]

    # resume: buckets 0-2 skipped, 3-5 processed
    summary = run_checkpointed_extract(spark, df, out, n_buckets=6)
    assert summary["resumed_buckets"] == [0, 1, 2]
    assert summary["processed_buckets"] == [3, 4, 5]

    # output identical to the oracle, nothing lost or duplicated
    rows = pq.read_table(fixture_dir["pages"]).to_pylist()
    expected = {r.url: r.text for r in oracle.extract_table(rows)}
    got_rows = read_checkpointed_output(spark, out).collect()
    got = {r["url"]: r["text"] for r in got_rows}
    assert len(got_rows) == len(expected)
    assert got == expected

    # counters: lineage metrics add up
    total_docs = sum(c["docs"] for c in summary["counters"].values())
    assert total_docs == len(expected)
    total_errors = sum(c["errors"] for c in summary["counters"].values())
    assert total_errors == 0
    assert all(c["bytes_extracted"] > 0 for c in summary["counters"].values())


def test_second_resume_is_noop(spark, fixture_dir, tmp_path):
    out = str(tmp_path / "ckpt2")
    df = spark.read.parquet(fixture_dir["pages"])
    run_checkpointed_extract(spark, df, out, n_buckets=3)
    summary = run_checkpointed_extract(spark, df, out, n_buckets=3)
    assert summary["resumed_buckets"] == [0, 1, 2]
    assert summary["processed_buckets"] == []
