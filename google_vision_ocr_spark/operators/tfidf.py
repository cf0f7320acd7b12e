"""TF-IDF salient-term extraction — the classic "what is this document
about" signal used for topic tagging and quality triage in web-corpus
pipelines.

Plan shape (three aggregates, no all-pairs anything):

1. ``tf``  — explode words, count per (doc, word): map-side combinable;
2. ``df``  — count docs per word over the tf frame (vocabulary-sized);
3. score   — tf ⋈ df on word (the one vocabulary shuffle), corpus size
   cross-joined in as a broadcast 1-row frame, then a per-document
   top-k window (bounded per key: one document's vocabulary).

Cross-engine determinism: tf/df/n are exact integers; the only float
is ``tfidf = tf · ln(n/df)``, ROUNDED to 6 dp before it is either
output or used for ordering, with (tf DESC, word ASC) tie-breaks after
it — mathematically-equal scores from different (tf, df) pairs (e.g.
2·ln(10) vs ln(100)) land on the same rounded value in any IEEE engine
and resolve by the integer keys, never by the last ULP of a log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .scoring import WORDS_EXPR


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF: returns
    (id, rank, term, tf, df, tfidf)."""
    words = docs.select(
        F.col(id_col),
        F.explode(F.expr(WORDS_EXPR.format(col=text_col))).alias("term"),
    )
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("__n").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("tf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df", "tfidf")
    )
