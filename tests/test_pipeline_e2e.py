"""End-to-end corpus pipeline: pages → curate → dedup → redact → score
→ split → pack → JSONL, with the report's funnel counters."""

import glob
import gzip
import json
import os

from pyspark.sql import functions as F


def test_corpus_pipeline_end_to_end(spark, fixture_dir, tmp_path):
    from google_vision_ocr_spark.plans.pipeline import run_corpus_pipeline

    pages = spark.read.parquet(fixture_dir["pages"])
    out = str(tmp_path / "corpus_out")
    os.makedirs(out, exist_ok=True)
    report = run_corpus_pipeline(
        pages, out, min_quality=0.1, min_tokens=2, shard_token_budget=500,
        chunk_size=32, chunk_stride=24,
    )
    # report sanity: the funnel only narrows
    assert report["docs_in"] >= report["pass_quality"] >= report["pass_lang"]
    assert report["docs_out"] == report["docs_written"] > 0
    assert report["n_shards"] > 0
    assert os.path.exists(os.path.join(out, "report.json"))

    # the written corpus is readable, has the contract columns, and
    # carries no un-redacted emails
    rows = []
    for p in glob.glob(os.path.join(out, "corpus", "*.json.gz")):
        with gzip.open(p, "rt") as f:
            rows.extend(json.loads(line) for line in f)
    assert len(rows) == report["docs_written"]
    assert set(rows[0]) == {"url", "lang_guess", "quality",
                            "avg_neg_logprob", "split", "text"}
    assert all("@" not in r["text"] or "<EMAIL>" in r["text"]
               for r in rows if "@" in r["text"])
    assert {r["split"] for r in rows} <= {"train", "val", "test"}

    # manifest shards respect the token budget within one-doc overshoot
    man = spark.read.parquet(os.path.join(out, "manifest"))
    worst = man.agg(F.max("sum_tokens")).collect()[0][0]
    biggest_doc = 2000  # fixture docs are far smaller than this
    assert worst < 500 + biggest_doc
    assert man.count() == report["n_shards"]

    # training-sequence chunks: split-partitioned parquet, windows of
    # at most 32 tokens, every written doc represented
    chunks = spark.read.parquet(os.path.join(out, "chunks"))
    assert chunks.count() == report["n_chunks"] > 0
    assert chunks.agg(F.max("n_tokens")).collect()[0][0] <= 32
    assert chunks.select("url").distinct().count() == report["docs_written"]
    assert {r.split for r in chunks.select("split").distinct().collect()} <= {
        "train", "val", "test"
    }
