"""Training-data curation plan: the 100 TB pipeline this engine exists
to run.

``pages table → extract (fused) → text metrics (tokens / quality /
lang-id) → quality + language gates → exact dedup → MinHash near-dup
removal → curated corpus + per-stage survival counters``

Design notes at scale:

- extraction is the fused single-scan plan (`plans/fused.py`);
- metrics ride in ONE vectorized pandas stage appended to the
  extraction output (no extra scan);
- exact dedup shuffles 16-byte digests, never text;
- near-dup removal joins only inside LSH buckets and drops the
  *higher* id of each candidate pair (deterministic, order-free);
- every gate's survivor count is observed in the same action via
  ``df.observe`` — no second pass over the data.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..functions.text import lang_id_series, quality_score
from ..operators.dedup import exact_dedup, minhash_lsh_pairs
from .fused import extract_fused

METRICS_SCHEMA = "quality double, lang_guess string, ws_tokens bigint"

_FRAME_RE = re.compile(r"\n--- Page \d+ ---\n")


def _make_metrics_udf():
    # built lazily: @pandas_udf parses its DDL schema eagerly, which
    # requires an active SparkSession — a module-level decorator would
    # make `import plans.curate` fail in sessionless processes
    @F.pandas_udf(METRICS_SCHEMA)
    def _metrics_udf(texts: pd.Series) -> pd.DataFrame:
        # metrics are about the CONTENT: drop the page-frame headers the
        # byte-identity contract mandates in pdf outputs (ocr_service.py:120)
        texts = texts.fillna("").map(lambda t: _FRAME_RE.sub("\n", t))
        return pd.DataFrame({
            "quality": texts.map(quality_score),
            "lang_guess": lang_id_series(texts),
            "ws_tokens": texts.map(lambda t: len(t.split())).astype("int64"),
        })

    return _metrics_udf


def with_text_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    m = _make_metrics_udf()(F.col(text_col))
    return (
        docs.withColumn("__m", m)
        .withColumn("quality", F.col("__m.quality"))
        .withColumn("lang_guess", F.col("__m.lang_guess"))
        .withColumn("ws_tokens", F.col("__m.ws_tokens"))
        .drop("__m")
    )


def curate(
    pages: DataFrame,
    min_quality: float = 0.3,
    min_tokens: int = 5,
    allowed_langs: tuple[str, ...] | None = None,
    near_dup_jaccard: float = 0.8,
    materialize: bool = True,
    max_dup_line_frac: float | None = None,
    **extract_kwargs,
) -> tuple[DataFrame, Observation]:
    """Returns (curated corpus, observation with per-stage counters).

    The observation resolves after the first action on the returned
    DataFrame; counters: docs_extracted is measured on the corpus that
    survived all gates plus per-gate booleans summed (survivors at each
    gate), so one pass yields the whole funnel.

    ``materialize=True`` (default) persists + eagerly evaluates the
    post-gate deduped corpus: it feeds THREE plan branches (the final
    anti-join and both sides of the near-dup pair join), so without a
    cache the extraction UDF stage runs ~3x per action.  The eager pass
    also resolves the funnel counters.  Pass ``materialize=False`` for
    a fully lazy plan (e.g. when composing into a larger job that does
    its own checkpointing).
    """
    docs = extract_fused(pages, **extract_kwargs)
    docs = docs.filter(F.col("n_errors") == 0)
    docs = with_text_metrics(docs)
    if max_dup_line_frac is not None:
        # Gopher repetition gate: zero-shuffle, rides the same scan
        from ..operators.quality_rules import repetition_metrics

        docs = (
            repetition_metrics(docs)
            .filter(F.col("dup_line_frac") <= max_dup_line_frac)
            .drop("n_lines", "dup_line_frac", "dup_line_char_frac")
        )

    q_ok = (F.col("quality") >= min_quality) & (F.col("ws_tokens") >= min_tokens)
    lang_ok = (
        F.col("lang_guess").isin(*allowed_langs) if allowed_langs else F.lit(True)
    )
    gated = docs.withColumn("__q_ok", q_ok).withColumn("__lang_ok", lang_ok)

    obs = Observation("curation-funnel")
    gated = gated.observe(
        obs,
        F.count(F.lit(1)).alias("docs_in"),
        F.sum(F.col("__q_ok").cast("int")).alias("pass_quality"),
        F.sum((F.col("__q_ok") & F.col("__lang_ok")).cast("int")).alias("pass_lang"),
    )
    kept = gated.filter(F.col("__q_ok") & F.col("__lang_ok")).drop("__q_ok", "__lang_ok")

    # exact dedup: keep the lexicographically-min url per identical text
    keepers = (
        kept.select(F.md5(F.col("text").cast("binary")).alias("text_hash"), "url")
        .groupBy("text_hash")
        .agg(F.min("url").alias("url"))
        .select("url")
    )
    deduped = kept.join(keepers, "url", "left_semi")
    if materialize:
        from .. import cache

        deduped = cache.track(deduped.persist())
        deduped.count()  # one extraction pass; later branches read cache

    # near-dup removal: drop the max-url side of each candidate pair
    pairs = minhash_lsh_pairs(deduped, id_col="url", text_col="text")
    losers = (
        pairs.filter(F.col("est_jaccard") >= near_dup_jaccard)
        .select(F.greatest("id_a", "id_b").alias("url"))
        .dropDuplicates(["url"])
    )
    curated = deduped.join(losers, "url", "left_anti")
    return curated, obs


def curation_report(curated: DataFrame, obs: Observation) -> dict:
    """Materialize the corpus stats + funnel counters in one action."""
    stats = curated.agg(
        F.count(F.lit(1)).alias("docs_out"),
        F.sum("ws_tokens").alias("tokens_out"),
        F.sum(F.octet_length("text")).alias("bytes_out"),
    ).collect()[0]
    funnel = {k: int(v) for k, v in obs.get.items()}
    return {**funnel, "docs_out": int(stats["docs_out"]),
            "tokens_out": int(stats["tokens_out"] or 0),
            "bytes_out": int(stats["bytes_out"] or 0)}
