"""spark-submit entry point for the full training-corpus pipeline.

    cd /root/repo && zip -qr /tmp/gvos.zip google_vision_ocr_spark

    spark-submit --py-files /tmp/gvos.zip scripts/submit_curate.py \\
        --input  /path/to/pages_parquet \\
        --output /path/to/corpus_out \\
        --langs en de --min-quality 0.3 --budget 100000

Stages: extract → quality/lang/repetition gates → exact + MinHash near
dedup → global paragraph dedup → PII redaction → unigram-LM scoring →
deterministic split → token-budget shard packing → sharded JSONL +
manifest + JSON report.  See ``plans/pipeline.py``.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--langs", nargs="*", default=None)
    ap.add_argument("--max-dup-line-frac", type=float, default=0.5)
    ap.add_argument("--lm-vocab", type=int, default=1000)
    ap.add_argument("--max-avg-neg-logprob", type=float, default=None)
    ap.add_argument("--budget", type=int, default=100000,
                    help="tokens per training shard")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("curate-corpus")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    from google_vision_ocr_spark.plans.pipeline import run_corpus_pipeline

    pages = spark.read.parquet(args.input)
    report = run_corpus_pipeline(
        pages,
        args.output,
        min_quality=args.min_quality,
        min_tokens=args.min_tokens,
        allowed_langs=tuple(args.langs) if args.langs else None,
        max_dup_line_frac=args.max_dup_line_frac,
        lm_vocab=args.lm_vocab,
        max_avg_neg_logprob=args.max_avg_neg_logprob,
        shard_token_budget=args.budget,
    )
    print(json.dumps(report, sort_keys=True))


if __name__ == "__main__":
    main()
