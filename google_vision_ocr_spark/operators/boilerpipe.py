"""Boilerpipe shallow-text-feature block classification (Kohlschütter,
Fankhauser & Nejdl, WSDM 2010, "Boilerplate Detection using Shallow
Text Features").

Second DOM-heuristic extractor for the north rule's "HTML boilerplate
strip" axis, complementing ``operators/justext.py``: where jusText
classifies blocks by stopword/link *density bands* plus a
context-smoothing pass, boilerpipe's published ``NumWordsRules``
decision tree uses only the *word counts* of the current / previous /
next block and two link-density splits.  Like the jusText twin this is
**zero shuffle, zero Python** — a pure scan-side map built from JVM
higher-order functions over the in-row block array, so at 100 TB it
composes with downstream dedup/packing without adding an exchange
(plan-asserted in ``tests/test_boilerpipe.py``).

Decision tree (the public boilerpipe ``NumWordsRulesClassifier``,
with its float thresholds 0.333333 / 0.555556 pinned to the exact
rationals 1/3 and 5/9 and evaluated as integer cross-multiplications
so the DuckDB oracle replays every comparison bit-for-bit).  Leaves
are numbered for the per-leaf output counters; B = boilerplate,
C = content:

    curr.link_words/curr.words > 1/3                 -> L1 B
    else, prev.link_words/prev.words <= 5/9:
        curr.words > 16                              -> L5 C
        next.words > 15                              -> L4 C
        prev.words > 4                               -> L3 C
        otherwise                                    -> L2 B
    else (prev link density > 5/9):
        curr.words > 40                              -> L8 C
        next.words > 17                              -> L7 C
        otherwise                                    -> L6 B

A missing neighbour (document edge) counts as the empty block
(0 words, 0 linked words), matching boilerpipe's sentinel
``TextBlock.EMPTY_START/END``.  Blocks, tag stripping and anchor
extraction are shared with the jusText module; ``words`` is the
space-split count of the stripped text, ``link_words`` the summed
word count of the stripped non-empty ``<a>`` fragments.

The reference app has no HTML stage at all (it OCRs page images —
``/root/reference/ocr_service.py``); this operator exists for the
north rule's DOM-heuristic axis, alongside ``functions/html.py`` (the
byte-identity boilerplate stripper) and ``operators/justext.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .justext import _ANCHOR_PAT, _BLOCK_PAT, _strip

#: content leaves of the decision tree (the rest are boilerplate)
CONTENT_LEAVES = (3, 4, 5, 7, 8)

# leaf id from current/prev/next counts at 0-based block index i; the
# prev/next arrays are sentinel-padded to length n so every bracket
# index stays in range under ANSI
_LEAF_CASE = """
    CASE WHEN 3 * __bp_l[i] > __bp_w[i] THEN 1
         WHEN 9 * __bp_pl[i] <= 5 * __bp_pw[i] THEN
              (CASE WHEN __bp_w[i] > 16 THEN 5
                    WHEN __bp_nw[i] > 15 THEN 4
                    WHEN __bp_pw[i] > 4 THEN 3
                    ELSE 2 END)
         ELSE (CASE WHEN __bp_w[i] > 40 THEN 8
                    WHEN __bp_nw[i] > 17 THEN 7
                    ELSE 6 END)
    END
"""


def boilerpipe_blocks(df: DataFrame, html_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """Per-document boilerpipe NumWordsRules verdicts over ``html_col``.

    Returns ``id_col`` plus exact-integer counters (``n_blocks``,
    ``n_content``, ``n_boiler``, per-leaf ``n_l1`` .. ``n_l8`` — the
    leaf counters make every branch of the tree falsifiable under the
    value-hash gate) and ``content_text`` (content blocks joined with
    newlines; ``''`` when nothing survives, so the column is non-null
    and hash-stable).
    """
    raw = f"regexp_extract_all({html_col}, '{_BLOCK_PAT}', 1)"
    # stripped text + linked-word count per block; empty blocks vanish
    # (an anchor that strips to '' contributes 0 words, guarded by the
    # inner filter — split('') would count 1)
    feats = f"""
        filter(
          transform({raw}, x -> named_struct(
            'txt', {_strip('x')},
            'lw', aggregate(
                filter(transform(regexp_extract_all(x, '{_ANCHOR_PAT}', 1),
                                 a -> {_strip('a')}), t -> t <> ''),
                0, (acc, t) -> acc + size(split(t, ' ')))
          )),
          s -> s.txt <> '')
    """
    out = (
        df.withColumn("__bp_f", F.expr(feats))
        .withColumn("__bp_w", F.expr("transform(__bp_f, s -> size(split(s.txt, ' ')))"))
        .withColumn("__bp_l", F.expr("transform(__bp_f, s -> s.lw)"))
        .withColumn("__bp_n", F.expr("size(__bp_f)"))
        # neighbour views: element i = words/link-words of block i-1 /
        # i+1, document edges = the 0-word empty-block sentinel
        .withColumn(
            "__bp_pw",
            F.expr("concat(array(0), slice(__bp_w, 1, greatest(__bp_n - 1, 0)))"),
        )
        .withColumn(
            "__bp_pl",
            F.expr("concat(array(0), slice(__bp_l, 1, greatest(__bp_n - 1, 0)))"),
        )
        .withColumn(
            "__bp_nw",
            F.expr("concat(slice(__bp_w, 2, greatest(__bp_n - 1, 0)), array(0))"),
        )
        # 0..n-1 robust to n = 0 (sequence(0, -1) would descend)
        .withColumn(
            "__bp_i",
            F.expr("slice(sequence(0, greatest(__bp_n, 1) - 1), 1, __bp_n)"),
        )
        .withColumn("__bp_leaf", F.expr(f"transform(__bp_i, i -> {_LEAF_CASE})"))
    )
    content_set = ", ".join(str(v) for v in CONTENT_LEAVES)
    leaf_cnt = lambda v: F.expr(f"size(filter(__bp_leaf, c -> c = {v}))").cast("bigint")  # noqa: E731
    guarded = out.withColumn(
        "content_text",
        F.expr(
            "array_join(filter("
            f"transform(__bp_i, i -> CASE WHEN array_contains(array({content_set}), "
            "__bp_leaf[i]) THEN __bp_f[i].txt ELSE '' END), "
            "x -> x <> ''), chr(10))"
        ),
    )
    return guarded.select(
        id_col,
        F.col("__bp_n").cast("bigint").alias("n_blocks"),
        F.expr(f"size(filter(__bp_leaf, c -> c IN ({content_set})))")
        .cast("bigint")
        .alias("n_content"),
        F.expr(f"size(filter(__bp_leaf, c -> NOT c IN ({content_set})))")
        .cast("bigint")
        .alias("n_boiler"),
        *[leaf_cnt(v).alias(f"n_l{v}") for v in range(1, 9)],
        "content_text",
    )
