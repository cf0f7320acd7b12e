"""C4-style line-level curation rules (Raffel et al. 2020, §2.2).

The C4 cleaning pass keeps a line only if it ends in a terminal
punctuation mark, has at least five words, and does not mention
``javascript``; it drops a whole page if it contains ``{`` (code) or
the boilerplate phrase ``lorem ipsum``, or retains fewer than three
lines after filtering.  This module computes those verdicts — plus the
reassembled kept text — entirely with JVM higher-order functions over
the in-row line array: **zero shuffle, zero Python**, bounded by
document size (web pages: tens-to-hundreds of lines), inside
whole-stage codegen.  At 100 TB this is a pure scan-side map — the
filter composes with any downstream dedup/packing stage without adding
an exchange, and the (page_keep, n_*) columns are exact integers so
the gate hash-compares them directly.

Line classification uses a fixed first-failing-rule order so counters
are well-defined in any engine: javascript → no terminal punctuation →
too short → kept.

The reference app has no corpus-curation stage (it is a per-document
OCR GUI); this operator is part of the mandated training-data toolkit
beside the Gopher repetition rules in ``quality_rules.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Terminal punctuation per C4: period, exclamation, question, closing
# double quote.  Kept as an endswith() chain — Spark's SQL literal
# parser mangles backslash classes, and these are single safe chars.
_PUNCT_PRED = (
    "(endswith(x,'.') OR endswith(x,'!') OR endswith(x,'?') OR endswith(x,'\"'))"
)

# First-failing-rule line code: 3=javascript, 2=no terminal punct,
# 1=fewer than `min_words` words, 0=kept.
_LINE_CODE = (
    "CASE WHEN contains(x, 'javascript') THEN 3 "
    f"WHEN NOT {_PUNCT_PRED} THEN 2 "
    "WHEN size(filter(split(x, ' '), y -> y <> '')) < {min_words} THEN 1 "
    "ELSE 0 END"
)


def c4_line_stats(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """Attach C4 line/page verdicts to ``df``.

    Adds ``n_lines`` / ``n_kept`` / ``n_short`` / ``n_nopunct`` /
    ``n_js`` (exact bigint line counts by first-failing rule),
    ``page_keep`` (int 0/1 — page survives the C4 page rules), and
    ``kept_text`` (the surviving lines rejoined with newlines; ``''``
    when the page is dropped, so the column is non-null and
    hash-stable).

    Lines are ``chr(10)``-separated; empty lines are ignored (C4
    operates on non-empty lines only).
    """
    code = _LINE_CODE.format(min_words=min_words)
    lines = f"filter(split({text_col}, chr(10)), x -> x <> '')"
    page_pred = (
        f"NOT contains({text_col}, '{{') "
        f"AND NOT contains({text_col}, 'lorem ipsum') "
        f"AND size(filter(__c4_c, c -> c = 0)) >= {min_kept_lines}"
    )
    kept_join = (
        "array_join(filter(transform(sequence(0, size(__c4_l) - 1), "
        "i -> CASE WHEN __c4_c[i] = 0 THEN __c4_l[i] ELSE '' END), "
        "x -> x <> ''), chr(10))"
    )
    # __c4_l / __c4_c are referenced by several downstream expressions,
    # so Catalyst keeps them materialized per row instead of re-running
    # the O(lines) lambdas once per consumer (CollapseProject only
    # inlines single-reference aliases).
    return (
        df.withColumn("__c4_l", F.expr(lines))
        .withColumn("__c4_c", F.expr(f"transform(__c4_l, x -> {code})"))
        .withColumn("n_lines", F.expr("size(__c4_l)").cast("bigint"))
        .withColumn(
            "n_kept", F.expr("size(filter(__c4_c, c -> c = 0))").cast("bigint")
        )
        .withColumn(
            "n_short", F.expr("size(filter(__c4_c, c -> c = 1))").cast("bigint")
        )
        .withColumn(
            "n_nopunct",
            F.expr("size(filter(__c4_c, c -> c = 2))").cast("bigint"),
        )
        .withColumn(
            "n_js", F.expr("size(filter(__c4_c, c -> c = 3))").cast("bigint")
        )
        .withColumn(
            "page_keep",
            F.expr(f"CASE WHEN {page_pred} THEN 1 ELSE 0 END").cast("int"),
        )
        .withColumn(
            "kept_text",
            F.expr(f"CASE WHEN {page_pred} THEN {kept_join} ELSE '' END"),
        )
        .drop("__c4_l", "__c4_c")
    )


def c4_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """The curation form: keep only surviving pages, with ``text_col``
    replaced by the cleaned ``kept_text`` (stats columns dropped)."""
    stats = c4_line_stats(
        df, text_col=text_col, min_words=min_words, min_kept_lines=min_kept_lines
    )
    out_cols = [
        F.col("kept_text").alias(text_col) if c == text_col else F.col(c)
        for c in df.columns
    ]
    return stats.filter(F.col("page_keep") == 1).select(*out_cols)
