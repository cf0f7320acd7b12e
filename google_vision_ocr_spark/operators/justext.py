"""jusText-style main-content block classification (Pomikalek 2011).

The north rule mandates "HTML boilerplate strip ... DOM heuristics"
for web-page payloads.  ``functions/html.py`` is the general tag-aware
parser (pandas UDF, byte-identity with the single-process oracle);
this module is its declarative twin: the jusText *block density
heuristic* — link density, stopword density, length bands, then a
context-sensitive smoothing pass over neighbouring blocks — expressed
entirely with JVM higher-order functions over the in-row block array.
**Zero shuffle, zero Python**: at 100 TB this is a pure scan-side map
that composes with any downstream dedup/packing stage without adding
an exchange (plan-asserted in ``tests/test_justext.py``).

Algorithm (fixed, documented parameters; all density comparisons are
exact integer cross-multiplications so the DuckDB oracle replays them
bit-for-bit — no float thresholds):

1.  Blocks are the contents of ``<p>/<li>/<h1>`` elements (the
    synthesized corpus is well-formed lowercase markup; a production
    crawl would first canonicalize through the full parser in
    ``functions/html.py``).  Tags inside a block are stripped, runs of
    spaces collapse, the result is trimmed; empty blocks vanish.
2.  Per block: ``chars`` (stripped length), ``words`` (space-split),
    ``stops`` (words in a fixed 20-word stoplist), ``link_chars``
    (stripped length of text inside ``<a>`` elements).
3.  Context-free class, first matching rule wins
    (0=good, 1=near_good, 2=short, 3=bad):

    - ``5*link_chars > chars``      -> bad   (link density > 0.2)
    - ``chars < 40``                -> bad if any link chars else short
    - ``25*stops >= 8*words``       -> good if ``chars > 80`` else
                                        near_good   (density >= 0.32)
    - ``50*stops >= 9*words``       -> near_good    (density >= 0.18)
    - otherwise                     -> bad

4.  Context-sensitive pass (jusText's neighbour smoothing, simplified
    to a deterministic rule): let ``p``/``f`` be the class of the
    nearest *decisive* (good/bad) block before/after; a corpus edge
    counts as bad.  ``near_good`` becomes good iff ``p`` or ``f`` is
    good; ``short`` becomes good iff *both* are good; good/bad stand.
5.  ``main_text`` joins the final-good block texts with newlines.

The nearest-neighbour scan is O(blocks^2) per document via
slice+filter — blocks per web page are tens, not thousands, and the
quadratic stays inside whole-stage codegen (an array-accumulator
``aggregate`` would defeat codegen entirely; see the round-6 simhash
fold measurements in SURVEY §8).

The reference app has no HTML stage at all (it OCRs page images —
``/root/reference/ocr_service.py``); this operator exists for the
north rule's DOM-heuristic axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed stoplist (lowercase; the synthesized corpus is lowercase).
STOPLIST = (
    "the a an and or of to in is are on for with as at by it this that from"
).split()

LENGTH_LOW = 40
LENGTH_HIGH = 80

_BLOCK_PAT = "<(?:p|li|h1)[^>]*>(.*?)</(?:p|li|h1)>"
_ANCHOR_PAT = "<a[^>]*>(.*?)</a>"

def _strip(var: str) -> str:
    """Stripped, collapsed, trimmed text of a raw markup fragment."""
    return f"trim(regexp_replace(regexp_replace({var}, '<[^>]+>', ' '), ' +', ' '))"

_STOP_ARR = "array(" + ", ".join(f"'{w}'" for w in STOPLIST) + ")"

# context-free class from the (chars, words, stops, link_chars) struct b
_CF_CLASS = f"""
    CASE WHEN 5 * b.link_chars > b.chars THEN 3
         WHEN b.chars < {LENGTH_LOW} THEN (CASE WHEN b.link_chars > 0 THEN 3 ELSE 2 END)
         WHEN 25 * b.stops >= 8 * b.words THEN
              (CASE WHEN b.chars > {LENGTH_HIGH} THEN 0 ELSE 1 END)
         WHEN 50 * b.stops >= 9 * b.words THEN 1
         ELSE 3 END
"""


def justext_blocks(df: DataFrame, html_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """Per-document jusText verdicts over ``html_col``.

    Returns ``id_col`` plus exact-integer block counts by context-free
    class (``n_blocks / n_cf_good / n_cf_neargood / n_cf_short /
    n_cf_bad``), ``n_final_good`` after the context-sensitive pass,
    and ``main_text`` (final-good blocks joined with newlines; ``''``
    when nothing survives, so the column is non-null and hash-stable).
    """
    raw = f"regexp_extract_all({html_col}, '{_BLOCK_PAT}', 1)"
    # per-block text + anchor text, empties dropped AFTER stripping
    feats = f"""
        filter(
          transform({raw}, x -> named_struct(
            'txt', {_strip('x')},
            'link_chars', aggregate(
                transform(regexp_extract_all(x, '{_ANCHOR_PAT}', 1),
                          a -> length({_strip('a')})),
                0, (acc, v) -> acc + v)
          )),
          s -> s.txt <> '')
    """
    measured = """
        transform(__jx_f, s -> named_struct(
            'txt', s.txt,
            'chars', length(s.txt),
            'words', size(split(s.txt, ' ')),
            'stops', size(filter(split(s.txt, ' '),
                                 w -> array_contains(__jx_stop, w))),
            'link_chars', s.link_chars))
    """
    # __jx_b / __jx_c / __jx_p / __jx_n are each referenced more than
    # once downstream, so Catalyst keeps them materialized per row
    # (CollapseProject inlines only single-reference aliases).
    out = (
        df.withColumn("__jx_stop", F.expr(_STOP_ARR))
        .withColumn("__jx_f", F.expr(feats))
        .withColumn("__jx_b", F.expr(measured))
        .withColumn("__jx_c", F.expr(f"transform(__jx_b, b -> {_CF_CLASS})"))
        .withColumn("__jx_n", F.expr("size(__jx_b)"))
        # 0..n-1, robust to n = 0: sequence(0, -1) would DESCEND to
        # [0, -1], so build one extra element and slice to length n
        .withColumn(
            "__jx_i",
            F.expr("slice(sequence(0, greatest(__jx_n, 1) - 1), 1, __jx_n)"),
        )
        # nearest decisive (0 good / 3 bad) class before / after each
        # block; empty side coalesces to 3 (corpus edge counts as bad)
        .withColumn(
            "__jx_p",
            F.expr(
                "transform(__jx_i, i -> coalesce("
                "try_element_at(filter(slice(__jx_c, 1, i),"
                " c -> c = 0 OR c = 3), -1), 3))"
            ),
        )
        .withColumn(
            "__jx_fo",
            F.expr(
                "transform(__jx_i, i -> coalesce("
                "try_element_at(filter(slice(__jx_c, i + 2, __jx_n),"
                " c -> c = 0 OR c = 3), 1), 3))"
            ),
        )
        .withColumn(
            "__jx_final",
            F.expr(
                "transform(__jx_i, i -> "
                "CASE WHEN __jx_c[i] = 0 THEN 0 "
                "     WHEN __jx_c[i] = 3 THEN 3 "
                "     WHEN __jx_c[i] = 1 THEN "
                "          (CASE WHEN __jx_p[i] = 0 OR __jx_fo[i] = 0 THEN 0 ELSE 3 END) "
                "     ELSE (CASE WHEN __jx_p[i] = 0 AND __jx_fo[i] = 0 THEN 0 ELSE 3 END) "
                "END)"
            ),
        )
    )
    cnt = lambda arr, v: F.expr(f"size(filter({arr}, c -> c = {v}))").cast("bigint")  # noqa: E731
    guarded = out.withColumn(
        "main_text",
        F.expr(
            "array_join(filter("
            "transform(__jx_i, i -> "
            "CASE WHEN __jx_final[i] = 0 THEN __jx_b[i].txt ELSE '' END), "
            "x -> x <> ''), chr(10))"
        ),
    )
    return guarded.select(
        id_col,
        F.col("__jx_n").cast("bigint").alias("n_blocks"),
        cnt("__jx_c", 0).alias("n_cf_good"),
        cnt("__jx_c", 1).alias("n_cf_neargood"),
        cnt("__jx_c", 2).alias("n_cf_short"),
        cnt("__jx_c", 3).alias("n_cf_bad"),
        cnt("__jx_final", 0).alias("n_final_good"),
        "main_text",
    )
