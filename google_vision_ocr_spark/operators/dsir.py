"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

Selects raw-corpus documents whose hashed-n-gram distribution looks
like a (small) target corpus: fit unigram bag models over hashed
{1,2}-gram buckets for the target and the raw corpus, score every
document by its summed log importance ratio ln p_target/p_raw, and
keep the documents with above-average importance weight (the
deterministic stand-in for the paper's Gumbel resampling — selection
is monotone in the same weight).

Distributed shape (the part that matters at 100 TB):
- feature extraction is scan-side (tokens + bigrams hashed by the
  engine-shared md5 fold from :mod:`replayable` — no Python, and the
  same hash replays bit-for-bit in the DuckDB oracle);
- both bag models are ONE hash aggregation each over a fixed key
  space (``n_buckets`` ≤ 4096 rows on the wire — map-side combinable,
  skew-free by construction since keys are uniform hash buckets);
- the per-bucket log-ratio table and the corpus totals ride broadcast
  joins; scoring is one more map-side-combinable aggregation by
  doc — two shuffles total, both bounded.

Exactness: each per-occurrence log-ratio is quantized to micro-nats
(``round(x·1e6)`` as bigint — the lm_unigram/bm25 pattern) BEFORE the
per-doc sum, so document scores are order-independent exact integers;
the per-doc average uses an away-from-zero integer halfup on the
DIV/% split (both engines truncate toward zero), and the mean-relative
selection compares ``avg_micro · N > Σ avg_micro`` in exact int64
(|avg_micro| ≲ 2·10⁷ even for adversarial corpora, so the product is
safe for N up to ~4·10¹¹ documents).

The reference app has no data-selection stage; this is part of the
mandated training-data toolkit (quality/curation family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .replayable import _md5_int_sql, tokens_sql

#: hashed feature space size — the paper uses 10^4; 4096 keeps the
#: broadcast model table trivially small while leaving bucket
#: collisions rare at testdata vocab sizes
N_BUCKETS = 4096


def hashed_feature_buckets(
    docs: DataFrame,
    id_cols: tuple[str, ...],
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Explode ``docs`` into one row per hashed {1,2}-gram occurrence:
    ``(*id_cols, bucket)`` with ``bucket ∈ [0, n_buckets)``."""
    feats = (
        "flatten(array(__t, CASE WHEN size(__t) >= 2 THEN "
        "transform(sequence(0, size(__t) - 2), i -> concat(__t[i], ' ', __t[i+1])) "
        "ELSE array_repeat('', 0) END))"
    )
    return (
        docs.select(*id_cols, F.expr(tokens_sql(text_col)).alias("__t"))
        .select(*id_cols, F.explode(F.expr(feats)).alias("feat"))
        .select(
            *id_cols,
            F.expr(f"{_md5_int_sql('feat')} % {n_buckets}").alias("bucket"),
        )
    )


def dsir_scores(
    docs: DataFrame,
    target_col: str = "is_target",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """``(id, n_feats, logratio_micro, avg_micro, selected)`` per doc.

    ``target_col`` is an int 0/1 column marking the seed target
    corpus; the raw/source model is fit on ALL rows.  Documents with
    no tokens are dropped (no features to score — the exploded-join
    shape, matching ``unigram_logprob_scores``).  ``selected`` = 1 iff
    the doc's per-feature average importance weight is strictly above
    the corpus mean.
    """
    feats = hashed_feature_buckets(
        docs, (id_col, target_col), text_col, n_buckets
    )
    src = feats.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("s_cnt")
    )
    tgt = (
        feats.filter(F.col(target_col) == 1)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t_cnt"))
    )
    # target ⊆ source, so a left join from source covers every bucket;
    # both sides are ≤ n_buckets rows but the optimizer only knows
    # that post-aggregation — broadcast explicitly
    model = src.join(F.broadcast(tgt), "bucket", "left").select(
        "bucket",
        "s_cnt",
        F.coalesce("t_cnt", F.lit(0)).cast("bigint").alias("t_cnt"),
    )
    totals = model.agg(
        F.sum("s_cnt").cast("bigint").alias("S"),
        F.sum("t_cnt").cast("bigint").alias("T"),
    )
    # Laplace-smoothed log ratio per bucket, micro-nat quantized —
    # computed IN-ENGINE on exact integer inputs (identical doubles),
    # never on the driver, so the oracle replays the same ln/round
    lmodel = model.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.expr(
            f"CAST(round((ln(CAST(t_cnt + 1 AS DOUBLE) / CAST(T + {n_buckets} AS DOUBLE))"
            f" - ln(CAST(s_cnt + 1 AS DOUBLE) / CAST(S + {n_buckets} AS DOUBLE)))"
            " * 1000000.0) AS BIGINT)"
        ).alias("l_micro"),
    )
    # away-from-zero integer halfup of logratio_micro / n_feats via the
    # DIV/% split (both engines truncate toward zero; |r| < n_feats)
    avg = (
        "(logratio_micro DIV n_feats) + (CASE WHEN logratio_micro >= 0"
        " AND 2 * (logratio_micro % n_feats) >= n_feats THEN 1"
        " WHEN logratio_micro < 0"
        " AND -2 * (logratio_micro % n_feats) >= n_feats THEN -1 ELSE 0 END)"
    )
    scores = (
        feats.join(F.broadcast(lmodel), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            F.sum("l_micro").cast("bigint").alias("logratio_micro"),
        )
        .select(
            id_col,
            "n_feats",
            "logratio_micro",
            F.expr(avg).cast("bigint").alias("avg_micro"),
        )
    )
    thr = scores.agg(
        F.sum("avg_micro").cast("bigint").alias("A"),
        F.count(F.lit(1)).cast("bigint").alias("N"),
    )
    return scores.crossJoin(F.broadcast(thr)).select(
        id_col,
        "n_feats",
        "logratio_micro",
        "avg_micro",
        F.expr("CASE WHEN avg_micro * N > A THEN 1 ELSE 0 END")
        .cast("int")
        .alias("selected"),
    )
