"""RefinedWeb-style line-wise corrections (Penedo et al. 2023,
"The RefinedWeb Dataset for Falcon LLM", §G line-wise filtering).

Where C4 (``c4_filters.py``) drops lines by punctuation/length,
RefinedWeb's pass removes the *social-media and navigation residue*
that survives boilerplate extraction — like/counter lines, purely
numerical lines, mostly-uppercase lines, short navigation stubs — and
then drops the whole document when the removed material exceeds a
fraction of its characters (the page was probably chrome, not prose).

All verdicts are JVM higher-order functions over the in-row line
array: **zero shuffle, zero Python**, inside whole-stage codegen, so
at 100 TB the pass rides the extraction scan.  Every threshold is an
exact integer comparison (uppercase fraction by cross-multiplication,
the removal budget as ``100·removed > pct·total``) so the DuckDB
oracle replays them bit-for-bit.

Line rules, first-matching order (fixed so counters are
engine-independent; a ``3 LIKES`` line is a counter, not an
uppercase line):

1. counter   — ``^[0-9]+ (likes|comments|shares|views)$``;
2. numeric   — ``^[0-9][0-9 .,%:/-]*$`` (digits + numeric punctuation
   only);
3. uppercase — strictly more than half of the line's LETTERS are
   uppercase (``2·upper > alpha``; an all-digit line has no letters
   and is rule 2's business);
4. nav stub  — at most ``nav_max_words`` words AND a navigation
   keyword (``home / menu / sign in / log in``);
5. kept.

Document rule: drop when removed characters exceed ``drop_pct`` % of
total line characters (RefinedWeb uses 5 %).

The reference app has no curation stage; this belongs to the
training-data toolkit beside c4_filters / quality_rules / ccnet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NAV_WORDS = ("home", "menu", "sign in", "log in")

_NAV_PRED = " OR ".join(f"contains(x, '{w}')" for w in NAV_WORDS)

# first-matching-rule line code: 1=counter, 2=numeric, 3=uppercase,
# 4=nav, 0=kept
_LINE_CODE = (
    "CASE WHEN x rlike '^[0-9]+ (likes|comments|shares|views)$' THEN 1 "
    "WHEN x rlike '^[0-9][0-9 .,%:/-]*$' THEN 2 "
    "WHEN 2 * length(regexp_replace(x, '[^A-Z]', '')) "
    "   > length(regexp_replace(x, '[^A-Za-z]', '')) THEN 3 "
    "WHEN size(filter(split(x, ' '), y -> y <> '')) <= {nav_max_words} "
    f"   AND ({_NAV_PRED}) THEN 4 "
    "ELSE 0 END"
)


def refinedweb_line_stats(
    df: DataFrame,
    text_col: str = "text",
    nav_max_words: int = 4,
    drop_pct: int = 5,
) -> DataFrame:
    """Attach RefinedWeb line/document verdicts to ``df``.

    Adds ``n_lines`` / ``n_kept`` / ``n_counter`` / ``n_numeric`` /
    ``n_upper`` / ``n_nav`` (exact bigint counts by first-matching
    rule), ``total_chars`` / ``removed_chars`` (summed line lengths),
    ``doc_keep`` (int 0/1 — ``100·removed <= drop_pct·total``; an
    empty doc keeps trivially), and ``kept_text`` (surviving lines
    rejoined with newlines; ``''`` when the document drops)."""
    code = _LINE_CODE.format(nav_max_words=nav_max_words)
    lines = f"filter(split({text_col}, chr(10)), x -> x <> '')"
    cnt = lambda v: F.expr(f"size(filter(__rw_c, c -> c = {v}))").cast("bigint")  # noqa: E731
    chars = (
        "aggregate(transform(__rw_i, "
        "i -> CASE WHEN {pred} THEN length(__rw_l[i]) ELSE 0 END), "
        "0L, (a, v) -> a + v)"
    )
    keep_pred = f"100 * removed_chars <= {drop_pct} * total_chars"
    kept_join = (
        "array_join(filter(transform(__rw_i, "
        "i -> CASE WHEN __rw_c[i] = 0 THEN __rw_l[i] ELSE '' END), "
        "x -> x <> ''), chr(10))"
    )
    # __rw_l / __rw_c are multi-referenced so Catalyst materializes
    # them per row (CollapseProject inlines only single-ref aliases)
    out = (
        df.withColumn("__rw_l", F.expr(lines))
        .withColumn("__rw_c", F.expr(f"transform(__rw_l, x -> {code})"))
        # 0..n-1 robust to n = 0 (sequence(0, -1) would DESCEND and
        # index an empty array under ANSI)
        .withColumn(
            "__rw_i",
            F.expr(
                "slice(sequence(0, greatest(size(__rw_l), 1) - 1), "
                "1, size(__rw_l))"
            ),
        )
        .withColumn("n_lines", F.expr("size(__rw_l)").cast("bigint"))
        .withColumn("n_kept", cnt(0))
        .withColumn("n_counter", cnt(1))
        .withColumn("n_numeric", cnt(2))
        .withColumn("n_upper", cnt(3))
        .withColumn("n_nav", cnt(4))
        .withColumn(
            "total_chars",
            F.expr(chars.format(pred="true")).cast("bigint"),
        )
        .withColumn(
            "removed_chars",
            F.expr(chars.format(pred="__rw_c[i] <> 0")).cast("bigint"),
        )
    )
    return (
        out.withColumn(
            "doc_keep",
            F.expr(f"CASE WHEN {keep_pred} THEN 1 ELSE 0 END").cast("int"),
        )
        .withColumn(
            "kept_text",
            F.expr(f"CASE WHEN {keep_pred} THEN {kept_join} ELSE '' END"),
        )
        .drop("__rw_l", "__rw_c", "__rw_i")
    )
