"""End-to-end training-corpus pipeline: pages → packed JSONL shards.

The composition a 100 TB training-data run actually executes, wired
from the operators this package already ships:

1. :func:`..plans.curate.curate` — extraction, quality/lang/repetition
   gates, exact + MinHash near dedup (one fused scan, funnel counters
   via ``df.observe``);
2. global paragraph-level dedup (boilerplate strip across documents);
3. PII redaction (scan-side regexp chain);
4. unigram-LM scoring with an optional cross-entropy cutoff (CCNet
   shape: train one hash-agg, broadcast, score in one pass);
5. deterministic md5 train/val/test split;
6. token-budget shard packing (two-pass distributed prefix sum) within
   each split;
7. sharded ``*.json.gz`` corpus + a parquet shard manifest + a JSON
   report with every funnel counter;
8. optionally (``chunk_size``): fixed-size token-window training
   sequences written as a parquet table alongside the corpus —
   scan-side generate over the already-persisted corpus frame, no
   extra shuffle.

Each stage is the scale-shape variant documented in ``docs/PLANS.md``;
the pipeline adds no new shuffle beyond its stages' own.  The corpus
frame is persisted once after the heavy curate+dedup prefix and reused
by the LM-training pass, the packing pass, and the write (tracked via
:mod:`..cache`).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import cache
from ..functions.redact import redact_pii
from ..operators.dedup import drop_repeated_paragraphs
from ..operators.packing import shard_manifest
from ..operators.sampling import deterministic_split
from ..operators.scoring import WORDS_EXPR, unigram_logprob_scores
from .curate import curate, curation_report


def run_corpus_pipeline(
    pages: DataFrame,
    out_dir: str,
    min_quality: float = 0.3,
    min_tokens: int = 5,
    allowed_langs: tuple[str, ...] | None = None,
    max_dup_line_frac: float | None = 0.5,
    lm_vocab: int = 1000,
    max_avg_neg_logprob: float | None = None,
    shard_token_budget: int = 2000,
    chunk_size: int | None = None,
    chunk_stride: int | None = None,
    **curate_kwargs,
) -> dict:
    """Run the full pipeline; returns the report dict (also written to
    ``out_dir/report.json``)."""
    curated, obs = curate(
        pages,
        min_quality=min_quality,
        min_tokens=min_tokens,
        allowed_langs=allowed_langs,
        max_dup_line_frac=max_dup_line_frac,
        **curate_kwargs,
    )
    # global paragraph dedup on the curated text, then redact
    paras = drop_repeated_paragraphs(
        curated.select(F.col("url").alias("doc_id"), "text"),
    ).select(F.col("doc_id").alias("url"), F.col("text_dedup"))
    corpus = (
        curated.drop("text")
        .join(paras, "url")
        .withColumn("text", redact_pii(F.col("text_dedup")))
        .drop("text_dedup")
        .filter(F.octet_length("text") > 0)
    )
    corpus = cache.track(corpus.persist())

    scored = unigram_logprob_scores(
        corpus, id_col="url", text_col="text", vocab_size=lm_vocab
    )
    corpus = corpus.join(scored.select("url", "avg_neg_logprob"), "url", "left")
    if max_avg_neg_logprob is not None:
        corpus = corpus.filter(
            F.coalesce(F.col("avg_neg_logprob"), F.lit(float("inf")))
            <= max_avg_neg_logprob
        )
    corpus = deterministic_split(corpus, id_col="url")

    tokens = corpus.select(
        "url", "split",
        F.size(F.expr(WORDS_EXPR.format(col="text"))).cast("bigint")
        .alias("ws_tokens_final"),
    )
    manifest = shard_manifest(
        tokens, budget=shard_token_budget, part_col="split",
        id_col="url", tokens_col="ws_tokens_final",
    )
    manifest.write.mode("overwrite").parquet(os.path.join(out_dir, "manifest"))

    from ..sources.jsonl import write_jsonl_corpus

    n_written = write_jsonl_corpus(
        corpus.select("url", "lang_guess", "quality", "avg_neg_logprob",
                      "split", "text"),
        os.path.join(out_dir, "corpus"),
    )
    report = curation_report(corpus, obs)
    report["docs_written"] = n_written
    report["n_shards"] = manifest.count()
    if chunk_size is not None:
        from ..operators.chunking import token_chunks

        chunks = token_chunks(
            corpus.select(F.col("url"), "split", "text"),
            id_col="url", size=chunk_size, stride=chunk_stride,
            passthrough_cols=("split",),
        )
        chunks.write.mode("overwrite").partitionBy("split").parquet(
            os.path.join(out_dir, "chunks")
        )
        report["n_chunks"] = chunks.count()
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    # every output is materialized by now; free the tracked persists so
    # a long-lived session running many pipelines doesn't accumulate
    cache.release_all()
    return report
