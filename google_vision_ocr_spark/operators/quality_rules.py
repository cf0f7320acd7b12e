"""Gopher-style repetition quality signals (Rae et al. 2021, §A1.1).

Web-corpus curation drops documents dominated by repeated lines or
paragraphs.  These metrics are computed entirely with JVM higher-order
functions over the in-row line array — **zero shuffle**: for a
per-document signal, exploding lines into a groupBy would shuffle the
whole corpus text twice; the in-row O(lines²) comparison is bounded by
document size (web pages: tens-to-hundreds of lines) and stays inside
whole-stage codegen.

Metrics (line-based; '\\n'-split, empty lines ignored):
- ``dup_line_frac``      — fraction of lines that are duplicates
  (1 - distinct/total).
- ``dup_line_char_frac`` — fraction of line characters inside lines
  that occur more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LINES = r"filter(split({col}, '\n'), x -> x <> '')"


def repetition_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach ``n_lines``, ``dup_line_frac``, ``dup_line_char_frac``."""
    lines = _LINES.format(col=text_col)
    n_lines = f"size({lines})"
    dup_chars = (
        f"aggregate(filter({lines}, x -> size(filter({lines}, y -> y = x)) > 1), "
        f"0L, (acc, x) -> acc + length(x))"
    )
    total_chars = f"aggregate({lines}, 0L, (acc, x) -> acc + length(x))"
    return (
        df.withColumn("n_lines", F.expr(n_lines).cast("bigint"))
        .withColumn(
            "dup_line_frac",
            F.when(
                F.col("n_lines") > 0,
                1.0 - F.expr(f"size(array_distinct({lines}))") / F.col("n_lines"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "dup_line_char_frac",
            F.when(
                F.expr(total_chars) > 0,
                F.expr(dup_chars) / F.expr(total_chars),
            ).otherwise(F.lit(0.0)),
        )
    )


def _tagged_ngram_expr(words_col: str, ns: tuple[int, ...]) -> str:
    """SQL expression building one flat ``array<struct<n,gram>>`` of all
    word ``n``-grams (space-joined) for every ``n`` in ``ns``.

    ``sequence(1, 0)`` DESCENDS in Spark, so each arm is guarded by an
    explicit ``size >= n`` branch whose empty case is a typed empty
    array (``array_repeat('', 0)``)."""
    arms = []
    for n in ns:
        grams = (
            f"CASE WHEN size({words_col}) >= {n} THEN "
            f"transform(sequence(1, size({words_col}) - {n} + 1), "
            f"i -> array_join(slice({words_col}, i, {n}), ' ')) "
            f"ELSE array_repeat('', 0) END"
        )
        arms.append(f"transform({grams}, g -> struct({n} AS n, g AS gram))")
    return f"flatten(array({', '.join(arms)}))"


def ngram_repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6),
) -> DataFrame:
    """Gopher word-``n``-gram repetition signals (Rae et al. 2021,
    §A1.1): per document, the character mass of the single most
    frequent ``n``-gram (``top{n}_gram_chars``, n in ``top_ns``) and of
    all ``n``-grams occurring more than once (``dup{n}_gram_chars``, n
    in ``dup_ns``), plus the denominator ``stream_chars`` (length of
    the lower-cased single-space-joined token stream).  All outputs are
    exact ``bigint`` — callers turn them into the paper's fractions
    with the shared integer half-up helpers, so the values are
    tie-proof across engines.

    Counting definition (pinned; matches the common public
    reimplementations that count every occurrence): an ``n``-gram's
    character mass is ``occurrences × length(gram)`` where the gram
    string is space-joined, so overlapping occurrences double-count —
    fractions may exceed 1 on degenerate inputs; thresholds treat them
    as signals, not probabilities.  The top gram tie-breaks by
    ``max(struct(count, chars))`` — most frequent first, largest
    character mass among ties — which both engines order identically,
    and equal-key ties all yield the same ``chars`` value, so the
    result never depends on scan order.

    Distributed shape (unlike the in-row line metrics above, the gram
    multiset is too heavy to keep in one row): one explode of tagged
    grams, then two hash aggregations keyed by ``(doc, n, gram)`` and
    ``doc`` — both map-side combinable, both skew-free because every
    key is prefixed by the document id; the final left join back to the
    id frame restores documents whose word count is below every ``n``.
    """
    ns = tuple(sorted(set(top_ns) | set(dup_ns)))
    words = F.filter(
        # RE2-pinned ASCII whitespace class (never \s: the oracle's RE2
        # \s is ASCII-only while Java's is not)
        F.split(F.lower(F.trim(F.col(text_col))), r"[ \t\n\f\r]+"),
        lambda x: x != "",
    )
    d = df.select(F.col(id_col), words.alias("__w")).select(
        id_col,
        F.expr("length(array_join(__w, ' '))").cast("bigint").alias("stream_chars"),
        F.expr(_tagged_ngram_expr("__w", ns)).alias("__g"),
    )
    ex = d.select(id_col, F.explode("__g").alias("__t")).select(
        id_col,
        F.col("__t.n").alias("__n"),
        F.col("__t.gram").alias("__gram"),
    )
    counts = (
        ex.groupBy(id_col, "__n", "__gram")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            id_col,
            "__n",
            "__cnt",
            (F.col("__cnt") * F.length("__gram").cast("bigint")).alias("__chars"),
        )
    )
    aggs = []
    for n in top_ns:
        aggs.append(
            F.max(
                F.when(F.col("__n") == n, F.struct(F.col("__cnt"), F.col("__chars")))
            )
            .getField("__chars")
            .alias(f"top{n}_gram_chars")
        )
    for n in dup_ns:
        aggs.append(
            F.sum(
                F.when((F.col("__n") == n) & (F.col("__cnt") > 1), F.col("__chars"))
            ).alias(f"dup{n}_gram_chars")
        )
    per_doc = counts.groupBy(id_col).agg(*aggs)
    out = d.select(id_col, "stream_chars").join(per_doc, id_col, "left")
    fill = [
        F.coalesce(F.col(c), F.lit(0).cast("bigint")).alias(c)
        for c in per_doc.columns
        if c != id_col
    ]
    return out.select(id_col, "stream_chars", *fill)


def repetition_gate(
    df: DataFrame,
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
) -> DataFrame:
    """Drop documents failing the Gopher repetition thresholds."""
    scored = repetition_metrics(df, text_col)
    return scored.filter(
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_line_char_frac") <= max_dup_line_char_frac)
    ).drop("n_lines", "dup_line_frac", "dup_line_char_frac")
