"""Fuzzy (edit-distance) matching at corpus scale — SymSpell-style
deletion-neighborhood blocking.

The naive "all word pairs within Levenshtein 1" is O(V²) over the
vocabulary; the scale-safe formulation indexes each word under every
string obtained by deleting ONE character (plus itself): two words at
edit distance ≤ 1 are guaranteed to share a variant key (delete the
inserted/substituted position), so candidates come from an equi-join
on the variant — each word emits only len+1 keys, the join is
hash-partitioned by variant, and the exact ``levenshtein`` check runs
only on candidates.  This is the spelling-variant / OCR-confusion
clustering step of a text pipeline (the same blocking SymSpell
popularized for spell-correction at scale).

All JVM built-ins: ``sequence``+``transform`` generate the deletion
variants scan-side, ``levenshtein`` confirms — no UDF, replayable in
SQL for the oracle.

Fanout note: a variant of length m only ever meets words of length m
or m+1 (deletion can't bridge more) — the length constraint is baked
into the key itself, so the blocking never pairs a short common
fragment with the whole vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the word itself plus every 1-deletion variant, as a SQL array expr
_VARIANTS_EXPR = (
    "concat(array({w}), "
    "transform(sequence(1, length({w})), "
    "i -> concat(substring({w}, 1, i - 1), substring({w}, i + 1, length({w})))))"
)


def fuzzy_word_pairs(
    words: DataFrame,
    word_col: str = "word",
    max_distance: int = 1,
) -> DataFrame:
    """Distinct unordered pairs (w1 < w2) of vocabulary entries within
    Levenshtein ``max_distance`` (1 supported — the deletion
    neighborhood only guarantees recall at distance 1)."""
    if max_distance != 1:
        raise ValueError("deletion-neighborhood blocking guarantees d=1 only")
    vocab = words.select(F.col(word_col).alias("__w")).distinct()
    keyed = vocab.select(
        "__w",
        F.explode(F.expr(_VARIANTS_EXPR.format(w="__w"))).alias("__v"),
    ).distinct()
    a = keyed.select(F.col("__w").alias("w1"), "__v")
    b = keyed.select(F.col("__w").alias("w2"), "__v")
    return (
        a.join(b, "__v")
        .filter(F.col("w1") < F.col("w2"))
        .select("w1", "w2")
        .distinct()
        .filter(F.levenshtein("w1", "w2") <= max_distance)
    )
