"""Incremental corpus refresh must equal a full rebuild.

The re-crawl story composed from the CDC primitives: diff the new
pages snapshot against the old at the payload grain, re-extract ONLY
the changed/added documents, merge the results over the previous
corpus (with deletes), and assert the outcome is identical to
extracting the new snapshot from scratch — the invariant that makes
incremental pipelines trustworthy at all."""

from pyspark.sql import functions as F

from google_vision_ocr_spark.operators.merge import merge_upsert, snapshot_diff
from google_vision_ocr_spark.plans.fused import extract_fused


def _extract(pages):
    return extract_fused(pages).select("url", "text", "n_pages", "n_errors")


def test_incremental_refresh_equals_full_rebuild(spark, fixture_dir):
    pages_v1 = spark.read.parquet(fixture_dir["pages"])
    urls = sorted(r.url for r in pages_v1.select("url").distinct().collect())
    dropped = set(urls[::7])
    mutated = set(urls[3::5]) - dropped
    donor_html = pages_v1.filter(F.col("url") == urls[1]).head().html

    other_cols = [c for c in pages_v1.columns if c != "url"]
    pages_v2 = (
        pages_v1.filter(~F.col("url").isin(list(dropped)))
        .withColumn(
            "html",
            F.when(F.col("url").isin(list(mutated)), F.lit(donor_html))
            .otherwise(F.col("html")),
        )
        .unionByName(
            pages_v1.filter(F.col("url") == urls[2]).select(
                F.concat(F.col("url"), F.lit("?v2")).alias("url"), *other_cols
            )
        )
    )

    # full rebuild — the gold answer
    gold = sorted(_extract(pages_v2).collect())

    # incremental: corpus v1 once, then diff the input payload digests
    corpus_v1 = _extract(pages_v1)
    digest = lambda df: df.select("url", F.md5("html").alias("content_digest"))  # noqa: E731
    changes = snapshot_diff(digest(pages_v1), digest(pages_v2), ["url"])
    to_extract = changes.filter(F.col("op") != "delete").select("url")
    re_extracted = _extract(
        pages_v2.join(to_extract, "url", "left_semi")
    ).withColumn("is_delete", F.lit(False))
    deletes = (
        changes.filter(F.col("op") == "delete")
        .select(
            "url",
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast(corpus_v1.schema["n_pages"].dataType).alias("n_pages"),
            F.lit(None).cast(corpus_v1.schema["n_errors"].dataType).alias("n_errors"),
            F.lit(True).alias("is_delete"),
        )
    )
    incremental = merge_upsert(
        corpus_v1,
        re_extracted.unionByName(deletes),
        ["url"],
        delete_col="is_delete",
    )
    assert sorted(incremental.collect()) == gold
    # and the refresh was genuinely partial
    n_changed = to_extract.count()
    assert 0 < n_changed < len(urls)
    assert n_changed == len(mutated) + 1  # mutations + the one insert
