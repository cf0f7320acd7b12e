"""Scale features: partition pruning, rate limiting, retry/backoff."""

import time

from pyspark.sql import functions as F

from google_vision_ocr_spark import fixtures


def test_partitioned_layout_prunes(spark, tmp_path):
    from google_vision_ocr_spark.sources.catalog import (
        read_pages_partitioned,
        write_pages_partitioned,
    )

    src = spark.createDataFrame(
        fixtures.generate_pages(n_urls=40, seed=3, skew_pages=10).to_pandas()
    )
    path = str(tmp_path / "pages_part")
    write_pages_partitioned(src, path, n_buckets=4)

    pruned = read_pages_partitioned(spark, path, url_buckets=[0, 1])
    full = read_pages_partitioned(spark, path)
    assert 0 < pruned.count() < full.count() == 40
    # the partition filter must show up in the scan, not as a post-filter
    plan = pruned._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan and "url_bucket" in plan.split("PartitionFilters")[1][:200]


def test_rate_limiter_throttles():
    from google_vision_ocr_spark.operators.recognize import TokenBucket

    bucket = TokenBucket(qps=200)
    t0 = time.monotonic()
    for _ in range(300):
        bucket.acquire()
    elapsed = time.monotonic() - t0
    # 300 acquisitions at 200 qps with burst 200 -> >= ~0.5s
    assert elapsed >= 0.4, elapsed


def test_retry_recovers_from_transient_failures(spark, fixture_dir):
    """flaky-stub fails each payload's first attempt; bounded backoff
    must recover with zero error rows and unchanged bytes."""
    import pyarrow.parquet as pq

    from google_vision_ocr_spark import oracle
    from google_vision_ocr_spark.plans.fused import extract_fused

    df = spark.read.parquet(fixture_dir["pages"]).limit(20)
    got = {r["url"]: r for r in
           extract_fused(df, recognizer="flaky-stub", max_retries=2,
                         backoff_base_s=0.01).collect()}
    urls = set(got)
    rows = [r for r in pq.read_table(fixture_dir["pages"]).to_pylist() if r["url"] in urls]
    for r in oracle.extract_table(rows):
        assert got[r.url]["n_errors"] == 0, r.url
        assert got[r.url]["text"] == r.text, r.url
